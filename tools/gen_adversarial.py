"""Adversarial replica of the testdata star schema: same schemas and
value domains, hostile structure — timestamp ties, short/duplicate
docs, even-n groups, >2dp prices on .5-mill rounding boundaries,
duplicate vectors, degenerate (zero-variance / one-sided / sub-season)
series.

The r9 run of the full oracle gate against this fixture flushed out 12
latent issues the stock fixtures can never hit (see SCALE.md "r9
adversarial gate"): 5 native-round() cross-engine divergences, 6 ANSI
divide-by-zero job-killers on degenerate slices, and one negative
slice length on a sub-two-season series.

The --sparse mode writes the near-empty variant instead (n≈1 regime),
which flushed 15 MORE: single-class eval metrics, zero-variance
denominators, an empty transition matrix, an empty-map literal, a
sub-two-observation trend model, and a DECIMAL(38) product silently
degrading to DOUBLE in DuckDB.

The --skewed mode (r10) writes the extreme-skew variant: one hub user
owning ~80% of events, giant identical-value tie classes, a universal
shingle present in every document, a 30-copy duplicate flood, a
50-copy identical embedding (ANN top-k tie stress), and one customer /
one order-date dominating the fact tables — the regime where rank
tie-breaks, prefix filters, and per-key state either hold or diverge.

Usage:
    python tools/gen_adversarial.py [outdir]            # default /tmp/adversarial-sf
    python tools/gen_adversarial.py --sparse [outdir]   # default /tmp/sparse-sf
    python tools/gen_adversarial.py --skewed [outdir]   # default /tmp/skewed-sf
    python tools/check_correctness.py --workers 4 --sf /tmp/adversarial-sf
"""
import datetime as dt
import random

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import os
import sys

rng = random.Random(1234)


SRC = "/root/testdata/sf0.001"


def write_adversarial(out: str) -> None:
    os.makedirs(out, exist_ok=True)
    # dims copied verbatim (domains must line up with join keys)
    for t in ("region", "nation", "customer", "supplier", "part"):
        duckdb.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    # --- events: heavy (user_id, ts) ties, tie-adjacent session gaps,
    # values on exact .5-cent boundaries, bursts at day boundaries
    base = dt.datetime(2024, 1, 1)
    ev = {"event_id": [], "ts": [], "user_id": [], "event_type": [], "value": [], "props": []}
    types = ["click", "error", "purchase", "signup", "view"]
    eid = 0
    for u in range(1, 40):
        t = base + dt.timedelta(hours=u % 13)
        for burst in range(rng.randint(2, 6)):
            # each burst: 2-4 events at the SAME timestamp
            for _ in range(rng.randint(2, 4)):
                eid += 1
                ev["event_id"].append(eid)
                ev["ts"].append(t)
                ev["user_id"].append(u)
                ev["event_type"].append(types[eid % 5])
                # exact .005 boundaries to stress cent rounding
                ev["value"].append(round((eid % 7) + 0.005 * (eid % 3), 3))
                ev["props"].append('{"k": %d}' % (eid % 100))
            # gap exactly 30 min (boundary: NOT > 30min -> same session)
            # alternated with 30min+1s (new session)
            t = t + dt.timedelta(minutes=30, seconds=(burst % 2))
    # midnight-tie burst (day attribution edges)
    for u in (50, 51):
        for k in range(4):
            eid += 1
            ev["event_id"].append(eid)
            ev["ts"].append(dt.datetime(2024, 1, 2, 0, 0, 0))
            ev["user_id"].append(u)
            ev["event_type"].append("purchase")
            ev["value"].append(10.005)
            ev["props"].append('{"k": 1}')
    pq.write_table(pa.table(ev), f"{out}/events.parquet")

    # --- documents: short docs (0..4 tokens), exact duplicates, near-dups,
    # single-token vocab collisions, whitespace edge (no empty text: fixture
    # never has it and split semantics on '' differ by design)
    docs = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    langs = ["de", "en", "es", "fr", "zh"]
    vocab = ["a", "b", "c", "the", "fast", "scan", "join"]
    for i in range(160):
        if i % 8 == 0:
            text = " ".join(rng.choices(vocab, k=rng.randint(1, 4)))  # short
        elif i % 8 == 1 and docs["text"]:
            text = docs["text"][-1]  # exact duplicate of previous
        elif i % 8 == 2:
            text = "x"  # 1 token, 1 char
        else:
            text = " ".join(rng.choices(vocab, k=rng.randint(5, 40)))
        docs["doc_id"].append(i)
        docs["text"].append(text)
        docs["lang"].append(langs[i % 5])
        docs["source"].append(f"src{i % 20}")
        docs["n_chars"].append(len(text))
    pq.write_table(pa.table(docs), f"{out}/documents.parquet")

    # --- embeddings: duplicate vectors, zero-adjacent norms kept positive,
    # label-skewed cells
    emb = {"vec_id": [], "embedding": [], "label": []}
    proto = [np.array([((j * 31 + k * 7) % 13 - 6) / 6.0 for k in range(64)],
                      dtype=np.float32) for j in range(8)]
    for i in range(120):
        v = proto[i % 8].copy()
        if i % 3 == 0:
            v = v * 1.0  # exact duplicate of a prototype
        else:
            v[i % 64] += 0.25
        emb["vec_id"].append(i)
        emb["embedding"].append(v.tolist())
        emb["label"].append(i % 3)  # 3 hot cells
    pq.write_table(
        pa.table({"vec_id": pa.array(emb["vec_id"], pa.int64()),
                  "embedding": pa.array(emb["embedding"], pa.list_(pa.float32())),
                  "label": pa.array(emb["label"], pa.int32())}),
        f"{out}/embeddings.parquet")

    # --- orders / lineitem: duplicated prices, even-n groups, orderdate ties
    o = {"o_orderkey": [], "o_custkey": [], "o_orderstatus": [], "o_totalprice": [],
         "o_orderdate": [], "o_orderpriority": []}
    li = {"l_orderkey": [], "l_partkey": [], "l_suppkey": [], "l_linenumber": [],
          "l_quantity": [], "l_extendedprice": [], "l_discount": [], "l_tax": [],
          "l_returnflag": [], "l_linestatus": [], "l_shipdate": []}
    custkeys = duckdb.sql(f"SELECT c_custkey FROM '{SRC}/customer.parquet'").fetchall()
    partkeys = duckdb.sql(f"SELECT p_partkey FROM '{SRC}/part.parquet'").fetchall()
    suppkeys = duckdb.sql(f"SELECT s_suppkey FROM '{SRC}/supplier.parquet'").fetchall()
    day0 = dt.datetime(1995, 1, 1)
    for ok in range(1, 301):
        o["o_orderkey"].append(ok)
        o["o_custkey"].append(custkeys[ok % len(custkeys)][0])
        o["o_orderstatus"].append("OF P"[ok % 3] if False else ["O", "F", "P"][ok % 3])
        o["o_totalprice"].append(1000.0 + (ok % 10) * 111.115)  # .5-mill boundaries
        o["o_orderdate"].append(day0 + dt.timedelta(days=(ok % 50)))  # heavy date ties
        o["o_orderpriority"].append(f"{1 + ok % 5}-X")
        for ln in range(1, (ok % 4) + 2):
            li["l_orderkey"].append(ok)
            li["l_partkey"].append(partkeys[(ok * 3 + ln) % len(partkeys)][0])
            li["l_suppkey"].append(suppkeys[(ok + ln) % len(suppkeys)][0])
            li["l_linenumber"].append(ln)
            li["l_quantity"].append(float((ok + ln) % 49 + 1))
            li["l_extendedprice"].append(100.0 + (ok % 6) * 250.125)  # duplicates + even n
            li["l_discount"].append((ln % 3) * 0.05)
            li["l_tax"].append((ln % 2) * 0.04)
            li["l_returnflag"].append(["A", "N", "R"][ok % 3])
            li["l_linestatus"].append(["O", "F"][ln % 2])
            li["l_shipdate"].append(day0 + dt.timedelta(days=(ok % 50) + ln))
    pq.write_table(pa.table(o), f"{out}/orders.parquet")
    pq.write_table(pa.table(li), f"{out}/lineitem.parquet")
    print("written", out)


def write_sparse(out: str) -> None:
    """Near-empty variant: 1 order/lineitem, 2 events, 3 docs, 5 vectors
    — the n≈1 regime where variance denominators, single-class metrics,
    empty transition matrices and sub-two-season series live. The r9 run
    of the gate against this flushed 15 more latent issues."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT * FROM '{SRC}/orders.parquet' ORDER BY o_orderkey LIMIT 1) TO '{out}/orders.parquet' (FORMAT PARQUET)")
    ok2 = con.execute(f"SELECT o_orderkey FROM '{out}/orders.parquet'").fetchone()[0]
    con.execute(f"COPY (SELECT * FROM '{SRC}/lineitem.parquet' WHERE l_orderkey = {ok2} LIMIT 1) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT * FROM '{SRC}/events.parquet' ORDER BY event_id LIMIT 2) TO '{out}/events.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT * FROM '{SRC}/documents.parquet' ORDER BY doc_id LIMIT 3) TO '{out}/documents.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT * FROM '{SRC}/embeddings.parquet' ORDER BY vec_id LIMIT 5) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    print("written", out)



def write_skewed(out: str) -> None:
    """Extreme-skew variant: the distributions a 100 TB lake actually
    has — hub keys, giant tie classes, duplicate floods. Every output
    that ranks, cuts at top-k, or blocks on a key must stay
    cross-engine deterministic when a tie class spans the cutoff."""
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part"):
        duckdb.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    # --- events: ONE hub user owns ~80% of rows; values drawn from a
    # 3-value domain so every ranked/quantile path sees giant ties;
    # event_type 'view' dominates 10:1 (class imbalance for the
    # balanced-downsample / funnel / markov paths).
    base = dt.datetime(2024, 3, 1)
    ev = {"event_id": [], "ts": [], "user_id": [], "event_type": [], "value": [], "props": []}
    types = ["view", "view", "view", "view", "view", "view", "view",
             "click", "purchase", "signup", "error"]
    eid = 0
    for k in range(800):  # hub user 1
        eid += 1
        ev["event_id"].append(eid)
        ev["ts"].append(base + dt.timedelta(minutes=7 * k))
        ev["user_id"].append(1)
        ev["event_type"].append(types[k % len(types)])
        ev["value"].append([5.0, 5.0, 12.5][k % 3])  # giant value ties
        ev["props"].append('{"k": %d}' % (k % 4))
    for u in range(2, 102):  # 100 cold users, 1-2 events each
        for j in range(1 + u % 2):
            eid += 1
            ev["event_id"].append(eid)
            ev["ts"].append(base + dt.timedelta(hours=u, minutes=j))
            ev["user_id"].append(u)
            ev["event_type"].append(types[(u + j) % len(types)])
            ev["value"].append(5.0)  # same tie class as the hub
            ev["props"].append('{"k": 0}')
    pq.write_table(pa.table(ev), f"{out}/events.parquet")

    # --- documents: a universal 3-gram ("the fast scan" appears in
    # EVERY doc → df == corpus size, the prefix filter's worst case);
    # a 30-copy duplicate flood (one giant dedup cluster); one source
    # owning 90% of docs.
    docs = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    flood = "the fast scan join over the fast scan again and again"
    for i in range(200):
        if i < 30:
            text = flood  # duplicate flood: one 30-doc cluster
        else:
            text = "the fast scan " + " ".join(
                rng.choices(["alpha", "beta", "gamma", "delta", "join", "scan"],
                            k=rng.randint(4, 25))
            )
        docs["doc_id"].append(i)
        docs["text"].append(text)
        docs["lang"].append("en" if i % 10 else "de")
        docs["source"].append("hub" if i % 10 else f"src{i % 3}")
        docs["n_chars"].append(len(text))
    pq.write_table(pa.table(docs), f"{out}/documents.parquet")

    # --- embeddings: 50 copies of the SAME vector (every pairwise
    # cosine among them is exactly 1.0 → the ANN top-k cutoff falls
    # INSIDE a tie class and only the neighbor_id tie-break decides),
    # plus a handful of distinct vectors and one near-orthogonal
    # outlier; labels 95% one class.
    emb = {"vec_id": [], "embedding": [], "label": []}
    hot = np.array([((k * 11) % 17 - 8) / 8.0 for k in range(64)], dtype=np.float32)
    for i in range(80):
        if i < 50:
            v = hot.copy()
        elif i == 50:
            v = np.roll(hot, 32) * np.float32(-1.0)  # far outlier
        else:
            v = hot.copy()
            v[i % 64] += np.float32(0.5 + (i % 5) * 0.125)
        emb["vec_id"].append(i)
        emb["embedding"].append(v.tolist())
        emb["label"].append(0 if i % 20 else 1)
    pq.write_table(
        pa.table({"vec_id": pa.array(emb["vec_id"], pa.int64()),
                  "embedding": pa.array(emb["embedding"], pa.list_(pa.float32())),
                  "label": pa.array(emb["label"], pa.int32())}),
        f"{out}/embeddings.parquet")

    # --- orders / lineitem: one customer owns 60% of orders; 70% of
    # orders share ONE orderdate (giant date tie class feeding every
    # daily rollup / asof / backlog path); quantities constant across a
    # large slice (zero variance inside hot groups).
    o = {"o_orderkey": [], "o_custkey": [], "o_orderstatus": [], "o_totalprice": [],
         "o_orderdate": [], "o_orderpriority": []}
    li = {"l_orderkey": [], "l_partkey": [], "l_suppkey": [], "l_linenumber": [],
          "l_quantity": [], "l_extendedprice": [], "l_discount": [], "l_tax": [],
          "l_returnflag": [], "l_linestatus": [], "l_shipdate": []}
    custkeys = duckdb.sql(f"SELECT c_custkey FROM '{SRC}/customer.parquet' ORDER BY c_custkey").fetchall()
    partkeys = duckdb.sql(f"SELECT p_partkey FROM '{SRC}/part.parquet' ORDER BY p_partkey").fetchall()
    suppkeys = duckdb.sql(f"SELECT s_suppkey FROM '{SRC}/supplier.parquet' ORDER BY s_suppkey").fetchall()
    day0 = dt.datetime(1996, 6, 1)
    hub_cust = custkeys[0][0]
    for ok in range(1, 401):
        o["o_orderkey"].append(ok)
        o["o_custkey"].append(hub_cust if ok % 5 < 3 else custkeys[ok % len(custkeys)][0])
        o["o_orderstatus"].append(["O", "F", "P"][ok % 3])
        o["o_totalprice"].append(2000.0 if ok % 4 else 2000.0 + ok)  # price ties
        o["o_orderdate"].append(day0 if ok % 10 < 7 else day0 + dt.timedelta(days=ok % 30))
        o["o_orderpriority"].append(f"{1 + ok % 5}-X")
        for ln in range(1, (ok % 3) + 2):
            li["l_orderkey"].append(ok)
            # hot part: ~40% of lines carry the SAME part (skew-join key)
            li["l_partkey"].append(partkeys[0][0] if (ok + ln) % 5 < 2
                                   else partkeys[(ok * 3 + ln) % len(partkeys)][0])
            li["l_suppkey"].append(suppkeys[(ok + ln) % len(suppkeys)][0])
            li["l_linenumber"].append(ln)
            li["l_quantity"].append(25.0)  # constant → zero variance in hot groups
            li["l_extendedprice"].append(500.0 if ok % 2 else 750.0)
            li["l_discount"].append(0.05)
            li["l_tax"].append(0.04)
            li["l_returnflag"].append(["A", "N", "R"][ok % 3])
            li["l_linestatus"].append(["O", "F"][ln % 2])
            li["l_shipdate"].append(day0 + dt.timedelta(days=(1 if ok % 10 < 7 else ok % 30) + ln))
    pq.write_table(pa.table(o), f"{out}/orders.parquet")
    pq.write_table(pa.table(li), f"{out}/lineitem.parquet")
    print("written", out)


def write_empty(out: str) -> None:
    """Zero-row variant (r10): every FACT table present with its full
    schema but zero rows; dimensions intact. This is the
    empty-increment regime a 100 TB pipeline hits constantly — a day
    with no events, an incremental batch with no new documents, a
    source that produced nothing — and the one regime no other corpus
    reaches (sparse is n≈1, not n=0). Flushes driver-side
    ``collect()[0]`` crashes, aggregates whose empty-input row-count
    conventions differ across engines, and NULL-propagation arithmetic
    that only an all-NULL aggregate output exercises."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet' LIMIT 0) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    print("written", out)


def write_nulls(out: str) -> None:
    """NULL-injection variant (r10): the stock fixtures contain ZERO
    nulls anywhere, so null handling was an untested regime — and the
    engines genuinely disagree on defaults (Spark sorts NULLS FIRST
    ascending, DuckDB NULLS LAST; both skip nulls in aggregates and
    drop null=null in equi-joins). Nulls go into the semantically
    OPTIONAL lake columns only — events.value (metric missing),
    events.props (no payload), events.event_type (untagged hit),
    documents.lang (unidentified), embeddings.embedding (failed embed
    job) — deterministically by key mod, so both engines see identical
    data. TPC-H tables stay null-free (NOT NULL per spec), bounding the
    blast radius to the events/documents/vectors operator families."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    con.execute(f"""
        COPY (
          SELECT event_id, ts, user_id,
                 CASE WHEN event_id % 19 = 0 THEN NULL ELSE event_type END
                   AS event_type,
                 CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value,
                 CASE WHEN event_id % 11 = 0 THEN NULL ELSE props END AS props
          FROM '{SRC}/events.parquet'
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT doc_id, text,
                 CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
                 source, n_chars
          FROM '{SRC}/documents.parquet'
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT vec_id,
                 CASE WHEN vec_id % 23 = 0 THEN NULL ELSE embedding END
                   AS embedding,
                 label
          FROM '{SRC}/embeddings.parquet'
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    print("written", out)


def write_unicode(out: str) -> None:
    """Unicode-hostile variant (r10): multilingual text is GUARANTEED
    input for a training-data engine, and the engines' string stacks
    differ under the hood (JVM UTF8String vs utf8proc; Java regex vs
    DuckDB RE2). Documents carry CJK (no spaces — one giant token),
    emoji with ZWJ/skin-tone sequences, combining diacritics
    (precomposed é vs e+U+0301 — distinct code points, equal glyphs),
    RTL Arabic/Hebrew, case-mapping edge cases (ß, Turkish dotted
    İ/dotless ı, final sigma ς), non-ASCII digits (١٢٣ / １２３),
    multi-space runs, leading/trailing spaces, a 10k-char token, and
    mixed-script identifiers. Events get unicode event_types and
    unicode JSON props (escaped + literal). Deterministic construction
    — both engines read identical bytes."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    samples = [
        "汉字文本没有空格所以整行是一个超长词元连续书写不分词",
        "日本語のテキストです 分かち書き も 混在 する",
        "👨‍👩‍👧‍👦 family 🏳️‍🌈 flag 👍🏽 thumbs 🇺🇳 regional",
        "café café precomposed vs combining mark",
        "STRASSE straße ß SS case mapping edge",
        "İstanbul ıssız dotted and dotless i TITLE case",
        "ΣΙΣΥΦΟΣ σίσυφος ς final sigma",
        "مرحبا بالعالم نص عربي من اليمين",
        "שלום עולם טקסט עברי",
        "digits ١٢٣ ٤٥٦ and fullwidth １２３ ４５６ mixed 123",
        "a  double  spaces   triple    runs between tokens",
        " leading and trailing spaces ",
        "tab\tand\rcarriage embedded controls",
        "x" * 10000 + " one giant token then normal words follow here",
        "naïve résumé coöperate diaeresis façade señor",
        "Ω≈ç√∫˜µ≤≥÷ math symbols ∑∏π∆",
        "ZWNJ‌joined and ZWJ‍joined invisibles",
        "mixed中文English词language混合text",
        "𝕳𝖊𝖑𝖑𝖔 𝖂𝖔𝖗𝖑𝖉 mathematical alphanumerics beyond BMP 𐍈",
        "email tëst@exämple.com phone ＋１２３４５６ unicode PII shapes",
    ]
    docs = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    langs = ["ar", "de", "el", "he", "ja", "tr", "zh"]
    for i in range(120):
        base = samples[i % len(samples)]
        # vary: plain, duplicated sample (near-dup pressure), suffixed
        if i % 3 == 1:
            text = base + " suffix" + str(i)
        elif i % 3 == 2 and docs["text"]:
            text = docs["text"][-1]  # exact duplicate
        else:
            text = base
        docs["doc_id"].append(i)
        docs["text"].append(text)
        docs["lang"].append(langs[i % len(langs)])
        docs["source"].append(f"src{i % 5}")
        docs["n_chars"].append(len(text))
    pq.write_table(pa.table(docs), f"{out}/documents.parquet")

    base = dt.datetime(2024, 5, 1)
    ev = {"event_id": [], "ts": [], "user_id": [], "event_type": [],
          "value": [], "props": []}
    utypes = ["view", "click", "purchase", "购买", "κλικ", "عرض", "☆star☆"]
    for i in range(1, 400):
        ev["event_id"].append(i)
        ev["ts"].append(base + dt.timedelta(minutes=i * 7 % 2880))
        ev["user_id"].append(1 + i % 37)
        ev["event_type"].append(utypes[i % len(utypes)])
        ev["value"].append(round((i % 13) * 1.25, 2))
        ev["props"].append(
            '{"city": "東京", "note": "caf\\u00e9", "emoji": "👍🏽"}'
            if i % 2 else '{"k": %d, "tag": "İı"}' % (i % 9)
        )
    pq.write_table(pa.table(ev), f"{out}/events.parquet")
    print("written", out)


def write_time(out: str) -> None:
    """Time-hostile variant (r10): the timestamp sentinels and calendar
    edges 100 TB of dirty data actually contains — epoch zero
    (1970-01-01T00:00:00, the classic null-substitute), pre-1970
    (negative epoch), the 9999-12-31 far-future sentinel, year/ISO-week
    boundary instants (Jan 1 falling mid-ISO-week — date_trunc('week')
    lands in the PREVIOUS year), end-of-month/leap-day (Feb 29),
    microsecond precision edges (.999999 vs .000001 one tick apart),
    midnight-exact day boundaries, and a user whose whole history sits
    in 1969. Order dates/ship dates get the same treatment on the
    TPC-H side where date arithmetic (date_diff/backlog spans) runs."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    ev = {"event_id": [], "ts": [], "user_id": [], "event_type": [],
          "value": [], "props": []}
    types = ["view", "click", "purchase", "signup", "error"]
    specials = [
        dt.datetime(1970, 1, 1, 0, 0, 0),                    # epoch zero
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),       # pre-epoch tick
        dt.datetime(1969, 7, 20, 20, 17, 40),                # deep pre-epoch
        dt.datetime(9999, 12, 31, 23, 59, 59),               # far-future sentinel
        dt.datetime(2024, 1, 1, 0, 0, 0),                    # year boundary
        dt.datetime(2023, 12, 31, 23, 59, 59, 999999),       # one tick before
        dt.datetime(2024, 2, 29, 12, 0, 0),                  # leap day
        dt.datetime(2024, 3, 31, 23, 59, 59),                # month end
        dt.datetime(2024, 4, 1, 0, 0, 0),                    # month start
        dt.datetime(2024, 6, 15, 0, 0, 0, 1),                # .000001 past midnight
    ]
    eid = 0
    # one user frozen in 1969; others mix sentinels with a normal cluster
    for u in range(1, 25):
        for k in range(8):
            eid += 1
            if u == 1:
                t = dt.datetime(1969, 6, 1) + dt.timedelta(hours=k * 7)
            elif k < 3:
                t = specials[(u + k) % len(specials)]
            else:
                t = dt.datetime(2024, 6, 10) + dt.timedelta(
                    minutes=(u * 97 + k * 31) % 4000
                )
            ev["event_id"].append(eid)
            ev["ts"].append(t)
            ev["user_id"].append(u)
            ev["event_type"].append(types[eid % 5])
            ev["value"].append(round((eid % 9) * 1.5, 2))
            ev["props"].append('{"k": %d}' % (eid % 50))
    # coverage block: EVERY sentinel instant × EVERY event type, so the
    # purchase-keyed time-series family cannot dodge a sentinel day by
    # type-cycling luck.
    for si, t in enumerate(specials):
        for ty in types:
            eid += 1
            ev["event_id"].append(eid)
            ev["ts"].append(t)
            ev["user_id"].append(90 + si % 5)
            ev["event_type"].append(ty)
            ev["value"].append(round((eid % 9) * 1.5, 2))
            ev["props"].append('{"k": %d}' % (eid % 50))
    pq.write_table(pa.table(ev), f"{out}/events.parquet")

    o = {"o_orderkey": [], "o_custkey": [], "o_orderstatus": [],
         "o_totalprice": [], "o_orderdate": [], "o_orderpriority": []}
    li = {"l_orderkey": [], "l_partkey": [], "l_suppkey": [],
          "l_linenumber": [], "l_quantity": [], "l_extendedprice": [],
          "l_discount": [], "l_tax": [], "l_returnflag": [],
          "l_linestatus": [], "l_shipdate": []}
    custkeys = [r[0] for r in duckdb.sql(f"SELECT c_custkey FROM '{SRC}/customer.parquet'").fetchall()]
    partkeys = [r[0] for r in duckdb.sql(f"SELECT p_partkey FROM '{SRC}/part.parquet'").fetchall()]
    suppkeys = [r[0] for r in duckdb.sql(f"SELECT s_suppkey FROM '{SRC}/supplier.parquet'").fetchall()]
    odates = [
        dt.datetime(1970, 1, 1), dt.datetime(1969, 12, 1),
        dt.datetime(9999, 12, 1), dt.datetime(1992, 2, 29),
        dt.datetime(1995, 12, 31), dt.datetime(1996, 1, 1),
        dt.datetime(1994, 6, 15), dt.datetime(1994, 6, 16),
    ]
    for ok in range(1, 201):
        o["o_orderkey"].append(ok)
        o["o_custkey"].append(custkeys[ok % len(custkeys)])
        o["o_orderstatus"].append(["O", "F", "P"][ok % 3])
        o["o_totalprice"].append(1000.0 + (ok % 10) * 123.45)
        o["o_orderdate"].append(odates[ok % len(odates)])
        o["o_orderpriority"].append(f"{1 + ok % 5}-X")
        for ln in range(1, (ok % 3) + 2):
            li["l_orderkey"].append(ok)
            li["l_partkey"].append(partkeys[(ok * 3 + ln) % len(partkeys)])
            li["l_suppkey"].append(suppkeys[(ok + ln) % len(suppkeys)])
            li["l_linenumber"].append(ln)
            li["l_quantity"].append(float((ok + ln) % 49 + 1))
            li["l_extendedprice"].append(100.0 + (ok % 6) * 250.5)
            li["l_discount"].append((ln % 3) * 0.05)
            li["l_tax"].append((ln % 2) * 0.04)
            li["l_returnflag"].append(["A", "N", "R"][ok % 3])
            li["l_linestatus"].append(["O", "F"][ln % 2])
            # ship AFTER order, pinned at the 9999 sentinel itself
            od = odates[ok % len(odates)]
            li["l_shipdate"].append(
                dt.datetime(9999, 12, 31)
                if od.year == 9999
                else od + dt.timedelta(days=ln * 17)
            )
    pq.write_table(pa.table(o), f"{out}/orders.parquet")
    pq.write_table(pa.table(li), f"{out}/lineitem.parquet")
    print("written", out)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--sparse" in sys.argv:
        write_sparse(args[0] if args else "/tmp/sparse-sf")
    elif "--skewed" in sys.argv:
        write_skewed(args[0] if args else "/tmp/skewed-sf")
    elif "--empty" in sys.argv:
        write_empty(args[0] if args else "/tmp/empty-sf")
    elif "--nulls" in sys.argv:
        write_nulls(args[0] if args else "/tmp/nulls-sf")
    elif "--unicode" in sys.argv:
        write_unicode(args[0] if args else "/tmp/unicode-sf")
    elif "--time" in sys.argv:
        write_time(args[0] if args else "/tmp/time-sf")
    else:
        write_adversarial(args[0] if args else "/tmp/adversarial-sf")
