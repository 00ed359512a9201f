"""LLM-training-pipeline operators, second wave (extends text.py/dedup.py).

The passes a 100 TB pretraining-data pipeline runs between raw crawl and
tokenizer: repetition filtering (Gopher-style), PII / deny-list scanning,
benchmark decontamination (n-gram overlap), corpus vocabulary statistics,
token-budget shard packing, and k-means clustering of embeddings.

Scale shapes:
- repetition / PII / packing are map-only or one-shuffle-on-doc_id stages;
- decontamination is an inverted-index join on shingles — cost ∝ matches,
  never |train| × |benchmark|;
- k-means is the classic broadcast-centroids loop: the corpus never
  shuffles, each iteration is a map (assign) plus one k×dim-sized
  aggregate; centroid coordinates are decimal-summed and rounded so the
  trajectory is bit-identical across engines (and across partitionings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .num import DEC, _round_ieee, _sql_round_ieee
from .registry import query

# ---------------------------------------------------------------------------
# repetition statistics (Gopher-style quality filter)
# ---------------------------------------------------------------------------


def _words() -> Column:
    return F.split(F.col("text"), " ")


@query(
    "text_repetition_stats",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1])) AS bigram
      FROM toks WHERE len(w) >= 2
    ),
    counts AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY doc_id, bigram)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT)   AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
           round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS dup_bigram_frac,
           round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)         AS top_bigram_frac
    FROM counts
    GROUP BY doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals per document — the Gopher-rule family: fraction
    of duplicated word bigrams and the share taken by the single most
    frequent bigram. High values flag boilerplate / template spam.

    Shape at scale: explode → two hash-aggs, both keyed by doc_id, so one
    shuffle partitions by document and everything after is local.
    """
    d = spark.table("documents")
    w = _words()
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = d.select("doc_id", F.explode(bigrams).alias("bigram"))
    counts = bi.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.count("*").cast("long").alias("n_distinct_bigrams"),
        F.round(
            F.lit(1.0) - F.count("*").cast("double") / F.sum("c").cast("double"), 6
        ).alias("dup_bigram_frac"),
        F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 6).alias(
            "top_bigram_frac"
        ),
    )


# ---------------------------------------------------------------------------
# PII / deny-list scan
# ---------------------------------------------------------------------------

#: Patterns shared by both engines (RE2 ∩ Java regex subset: no lookarounds).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_LONG_DIGITS_RE = r"[0-9]{6,}"
#: Deny-list scan: a configurable bad-terms list (here two corpus words so
#: the counts are non-trivially exercised on the synthetic data).
_DENYLIST_RE = r"\b(key|hash)\b"


@query(
    "text_pii_scan",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)       AS n_emails,
           CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS BIGINT)        AS n_ipv4,
           CAST(len(regexp_extract_all(text, '{_LONG_DIGITS_RE}')) AS BIGINT) AS n_long_digit_runs,
           CAST(len(regexp_extract_all(text, '{_DENYLIST_RE}')) AS BIGINT)    AS n_denylist_hits,
           (len(regexp_extract_all(text, '{_EMAIL_RE}'))
            + len(regexp_extract_all(text, '{_IPV4_RE}'))
            + len(regexp_extract_all(text, '{_LONG_DIGITS_RE}')) > 0)         AS has_pii
    FROM documents
    """,
)
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII and deny-list scanning: emails / IPv4 / long digit runs plus a
    configurable bad-terms list, all as JVM-side regexp_extract_all — a
    map-only stage that pipelines with the scan.

    NOTE: the synthetic corpus contains no PII, so the email/IP/digit
    counters legitimately read zero here (the deny-list counter exercises
    non-zero paths); the operator pins the filter's shape and the exact
    regex semantics both engines agree on (no lookarounds: RE2 ∩ Java).
    """
    d = spark.table("documents")

    def n_matches(pattern: str) -> Column:
        return F.size(F.regexp_extract_all(F.col("text"), F.lit(pattern), 0)).cast("long")

    n_pii = n_matches(_EMAIL_RE) + n_matches(_IPV4_RE) + n_matches(_LONG_DIGITS_RE)
    return d.select(
        "doc_id",
        n_matches(_EMAIL_RE).alias("n_emails"),
        n_matches(_IPV4_RE).alias("n_ipv4"),
        n_matches(_LONG_DIGITS_RE).alias("n_long_digit_runs"),
        n_matches(_DENYLIST_RE).alias("n_denylist_hits"),
        (n_pii > 0).alias("has_pii"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------

_SHINGLE_N = 5
_BENCH_MOD = 97  # doc_id % 97 == 0 → held-out "benchmark" split


@query(
    "text_decontaminate",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(w) - {_SHINGLE_N - 1}),
               i -> array_to_string(list_slice(w, i, i + {_SHINGLE_N - 1}), ' ')))) AS shingle
      FROM toks WHERE len(w) >= {_SHINGLE_N}
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_BENCH_MOD} = 0),
    train AS (SELECT * FROM sh WHERE doc_id % {_BENCH_MOD} <> 0)
    SELECT train.doc_id,
           CAST(count(*) AS BIGINT) AS n_shared_shingles
    FROM train JOIN bench USING (shingle)
    GROUP BY train.doc_id
    ORDER BY doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    {_SHINGLE_N}-gram with the held-out split (the n-gram-overlap check run
    before pretraining so eval data can't leak into the corpus).

    Scale shape: an inverted-index join on the shingle — benchmark
    shingles are a bounded set (eval suites are small) and broadcast;
    the training side never self-joins, so cost ∝ number of matches.
    """
    d = spark.table("documents")
    w = _words()
    shingles = F.when(
        F.size(w) >= _SHINGLE_N,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (_SHINGLE_N - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, F.lit(_SHINGLE_N))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", F.explode(shingles).alias("shingle"))
    bench = sh.filter(F.col("doc_id") % _BENCH_MOD == 0).select("shingle").distinct()
    train = sh.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared_shingles"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# corpus vocabulary statistics
# ---------------------------------------------------------------------------

_VOCAB_TOP_K = 50


@query(
    "text_vocab_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(count(*) AS BIGINT)               AS tf
    FROM tok
    GROUP BY token
    ORDER BY df DESC, tf DESC, token
    LIMIT {_VOCAB_TOP_K}
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-{_VOCAB_TOP_K} tokens by document
    frequency (tokenizer-training / mixture-diagnostic stats).

    Scale shape: explode → partial+final agg on token (map-side combine
    collapses each partition to its distinct tokens before the shuffle);
    the final top-k is a TakeOrdered over |vocab| rows, not |corpus|.
    """
    tok = spark.table("documents").select(
        "doc_id", F.explode(_words()).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count("*").cast("long").alias("tf"),
        )
        .orderBy(F.desc("df"), F.desc("tf"), "token")
        .limit(_VOCAB_TOP_K)
    )


# ---------------------------------------------------------------------------
# token-budget shard packing
# ---------------------------------------------------------------------------

_SHARD_BUDGET = 2000  # whitespace tokens per shard


@query(
    "pack_token_shards",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING) - n_tokens)
                      / {_SHARD_BUDGET}.0) AS BIGINT) AS shard_id
    FROM t
    """,
)
def pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget shard assignment (sequence-packing prep): within
    each source, documents in doc_id order accumulate into shards of
    ~{_SHARD_BUDGET} whitespace tokens; a document starts the shard its
    running prefix-sum falls into.

    Scale shape: one shuffle on source, a running-sum window inside each
    partition — same cost envelope as any per-key cumulative metric.
    Skewed sources split fine because the window is ROWS-framed.
    """
    d = spark.table("documents")
    n_tokens = F.size(_words()).cast("long")
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    prefix = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        d.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .withColumn(
            "shard_id", F.floor(prefix / float(_SHARD_BUDGET)).cast("long")
        )
    )


# ---------------------------------------------------------------------------
# k-means over embeddings (fixed-iteration Lloyd's, cross-engine exact)
# ---------------------------------------------------------------------------

_KMEANS_K = 4


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(v: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k centroids, one window
    per vector (ties break toward the lower centroid id)."""
    pairs = v.crossJoin(F.broadcast(cent)).select(
        "vec_id", "vec", "cid", _sqdist(F.col("vec"), F.col("cvec")).alias("d2")
    )
    rn = F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "cid"))
    return pairs.withColumn("rn", rn).filter(F.col("rn") == 1).select(
        "vec_id", "vec", "cid", "d2"
    )


def _recenter(assigned: DataFrame) -> DataFrame:
    """Per-cluster per-dimension mean, decimal-summed and rounded to 6 dp
    so the new centroids are identical regardless of engine or partition
    order (floating addition isn't associative; decimal is exact)."""
    return (
        assigned.select("cid", F.posexplode("vec").alias("dim", "val"))
        .groupBy("cid", "dim")
        .agg(
            F.round(
                F.sum(F.col("val").cast(DEC)).cast("double") / F.count("*"), 6
            ).alias("cval")
        )
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cval"))).alias("pairs"))
        .select(
            "cid", F.transform(F.col("pairs"), lambda s: s.getField("cval")).alias("cvec")
        )
    )


@query(
    "vectors_kmeans_assign",
    oracle=f"""
    WITH v AS (
      -- embedding IS NOT NULL (r10 nulls corpus): a failed-embed row
      -- has no position in vector space — and a NULL distance would
      -- rank FIRST in Spark's window but LAST in DuckDB's.
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    c0 AS (SELECT vec_id AS cid, vec AS cvec FROM v WHERE vec_id < {_KMEANS_K}),
    a1 AS (
      SELECT vec_id, vec, cid FROM (
        SELECT v.vec_id, v.vec, c0.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_sum(list_transform(list_zip(v.vec, c0.cvec),
                                                  s -> (s[1] - s[2]) * (s[1] - s[2]))),
                          c0.cid) AS rn
        FROM v CROSS JOIN c0
      ) WHERE rn = 1
    ),
    exploded AS (
      SELECT a1.cid, u.i AS dim, a1.vec[u.i] AS val
      FROM a1 CROSS JOIN unnest(generate_series(1, len(a1.vec))) AS u(i)
    ),
    c1 AS (
      SELECT cid, list(cval ORDER BY dim) AS cvec FROM (
        SELECT cid, dim,
               round(CAST(sum(CAST(val AS DECIMAL(30,8))) AS DOUBLE) / count(*), 6) AS cval
        FROM exploded GROUP BY cid, dim
      ) GROUP BY cid
    )
    SELECT vec_id, cid AS cluster, round(d2, 6) AS sq_dist FROM (
      SELECT v.vec_id, c1.cid,
             list_sum(list_transform(list_zip(v.vec, c1.cvec),
                                     s -> (s[1] - s[2]) * (s[1] - s[2]))) AS d2,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_sum(list_transform(list_zip(v.vec, c1.cvec),
                                                s -> (s[1] - s[2]) * (s[1] - s[2]))),
                        c1.cid) AS rn
      FROM v CROSS JOIN c1
    ) WHERE rn = 1
    """,
)
def vectors_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd's iterations of k-means (k={_KMEANS_K}), seeded
    deterministically with the {_KMEANS_K} lowest vec_ids, checked VALUE-
    EXACT against a DuckDB replica of the same trajectory — possible
    because each recentering decimal-sums per-dimension (order-invariant)
    and rounds to 6 dp, and both engines fold distances over arrays in the
    same element order.

    Scale shape per iteration: centroids are k×dim (broadcast), assignment
    is a map over the corpus (no shuffle of vectors), recentering is one
    k×dim-sized aggregate. A production loop would iterate to convergence
    with localCheckpoint between rounds (see dedup_near_dup_clusters).
    """
    v = (
        spark.table("embeddings")
        .filter(F.col("embedding").isNotNull())  # see oracle note
        .select("vec_id", _as_double(F.col("embedding")).alias("vec"))
    )
    c0 = v.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
    )
    a1 = _assign(v, c0)
    c1 = _recenter(a1)
    a2 = _assign(v, c1)
    return a2.select(
        "vec_id",
        F.col("cid").alias("cluster"),
        F.round("d2", 6).alias("sq_dist"),
    )


# ---------------------------------------------------------------------------
# winsorization (percentile outlier clipping)
# ---------------------------------------------------------------------------


@query(
    "clean_winsorize",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(CASE WHEN NOT isnan(value) THEN value END, 0.05) AS lo,
             quantile_cont(CASE WHEN NOT isnan(value) THEN value END, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id,
           round(CASE WHEN e.value < b.lo THEN b.lo
                      WHEN e.value > b.hi THEN b.hi
                      ELSE e.value END, 6) AS value_w,
           (e.value < b.lo OR e.value > b.hi) AS was_clipped
    FROM events e JOIN bounds b USING (event_type)
    """,
)
def clean_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clip each event's value to its type's
    exact [p5, p95] band — the standard outlier-taming pass before
    feature aggregation. The interpolated bounds are reconstructed with
    ``percentile``/``quantile_cont``'s shared formula (``h = p·(n−1)``,
    linear between the straddling elements), so the clipped values
    match both engines bitwise.

    Scale shape (r13, VERDICT r12 ask #4): the bounds come from the
    fixed-width-histogram + exact-refine machinery
    (:func:`num.grid_quantiles` — the r12 compressed (type, value)
    domain window sorted every distinct value per group; now the
    exchange and window carry only a ≤ value-range/width histogram at
    any data scale, and a second scan refines the covering buckets
    exactly). The bounds relation stays |types| rows → broadcast back,
    then a map-only clip — the fact table still shuffles zero times.

    NaN convention (r13, r12 ADVICE): NaN values carry ZERO weight in
    the bounds domain, so the oracle maps NaN → NULL inside
    ``quantile_cont`` (skipped) to match. In the clip stage both
    engines already agree NaN compares larger than any bound, so a NaN
    value clips to ``hi`` identically on both sides.
    """
    from .num import grid_quantiles

    e = spark.table("events")
    # events.value sits in ~[0, 560] at every SF: width 1 → ≤ ~600
    # histogram buckets, refine ~2 buckets per type (any width is
    # correct; it only tunes histogram size vs refine selectivity)
    stacked = e.selectExpr(
        "event_type AS grp",
        "stack(2, 'p05', CAST(value AS DOUBLE), 1.0D,"
        "         'p95', CAST(value AS DOUBLE), 1.0D) AS (m, v, wd)",
    )
    bounds = (
        grid_quantiles(stacked, {"p05": 0.05, "p95": 0.95})
        .groupBy("grp")
        .pivot("m", ["p05", "p95"])
        .agg(F.first("val"))
        .select(
            F.col("grp").alias("event_type"),
            F.col("p05").alias("lo"),
            F.col("p95").alias("hi"),
        )
    )
    clipped = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    return e.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        F.round(clipped, 6).alias("value_w"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "was_clipped"
        ),
    )


@query(
    "filter_quality_percentile",
    oracle="""
    WITH feat AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
             CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS BIGINT) AS n_stop,
             CAST(n_chars AS BIGINT) AS n_chars
      FROM documents
    ), scored AS (
      SELECT doc_id, source,
             round(
               0.5 * least(n_chars / 500.0, 1.0)
               + 0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens)
               + 0.2 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens),
             6) AS quality
      FROM feat
    ), ranked AS (
      SELECT doc_id, source, quality,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY quality, doc_id) AS pct
      FROM scored
    )
    SELECT doc_id, source, quality,
           (floor(pct * 1000000.0 + 0.5) / 1000000.0) AS pct
    FROM ranked
    WHERE pct >= 0.2
    ORDER BY doc_id
    """,
)
def filter_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-percentile filtering: drop each source's bottom
    quality quintile — the rank-based variant of threshold filtering
    that survives per-source score-distribution drift (a fixed absolute
    cutoff over- or under-prunes sources with different baselines).
    Reuses text_quality_score's fixed-shape feature expression;
    percent_rank is the exact rational (rank−1)/(n−1) with ties broken
    by doc_id, so the cutoff is engine-deterministic. One shuffle (by
    source, for the ranking window) of (id, score) pairs only — the
    text never moves. At corpus scale a skewed source partition would
    salt on a quality-bucket prefix; the window state is one partition's
    rank counter either way."""
    from .text import _n_stop, _words

    d = spark.table("documents")
    n_tokens = F.size(_words()).cast("long")
    n_distinct = F.size(F.array_distinct(_words())).cast("long")
    n_stop = _n_stop(_words()).cast("long")
    quality = F.round(
        F.lit(0.5) * F.least(F.col("n_chars") / 500.0, F.lit(1.0))
        + F.lit(0.3) * (n_distinct.cast("double") / n_tokens)
        + F.lit(0.2) * (F.lit(1.0) - n_stop.cast("double") / n_tokens),
        6,
    )
    scored = d.select("doc_id", "source", quality.alias("quality"))
    w = W.partitionBy("source").orderBy("quality", "doc_id")
    ranked = scored.withColumn("pct", F.percent_rank().over(w))
    return (
        ranked.filter(F.col("pct") >= 0.2)
        .select(
            "doc_id",
            "source",
            "quality",
            (F.floor(F.col("pct") * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("pct"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

#: Minimum bigram count for a PMI candidate (standard noise floor: PMI of
#: a hapax pair is maximal by construction and meaningless).
_PMI_MIN_COUNT = 5
_PMI_TOP_K = 20

#: Fixed-shape PMI expression — four divisions, one multiply, one ln, in
#: this exact order on both engines, so the IEEE result is identical:
#: pmi = ln( (c12/n_big) / ((c1/n_uni) · (c2/n_uni)) ).
_SQL_PMI = (
    "round(ln((CAST(c12 AS DOUBLE) / CAST(n_big AS DOUBLE)) / "
    "((CAST(c1 AS DOUBLE) / CAST(n_uni AS DOUBLE)) * "
    "(CAST(c2 AS DOUBLE) / CAST(n_uni AS DOUBLE)))), 6)"
)


@query(
    "text_pmi_bigrams",
    oracle=f"""
    WITH arrs AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents
    ), tok AS (
      SELECT unnest(arr) AS w FROM arrs
    ), uni AS (
      SELECT w, count(*) AS c FROM tok GROUP BY 1
    ), pairs AS (
      SELECT arr[i] AS w1, arr[i + 1] AS w2
      FROM arrs, LATERAL (SELECT unnest(range(1, len(arr))) AS i) s
    ), big AS (
      SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2
    ), n AS (
      SELECT (SELECT sum(c) FROM uni) AS n_uni,
             (SELECT count(*) FROM pairs) AS n_big
    )
    , joined AS (
      SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2, n_uni, n_big
      FROM big
        JOIN uni u1 ON u1.w = big.w1
        JOIN uni u2 ON u2.w = big.w2
        CROSS JOIN n
      WHERE c12 >= {_PMI_MIN_COUNT}
    )
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, {_SQL_PMI} AS pmi
    FROM joined
    ORDER BY pmi DESC, w1, w2 LIMIT {_PMI_TOP_K}
    """,
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_PMI_TOP_K} collocations by pointwise mutual information —
    the phrase-mining pass (e.g. "new york"-style units) a corpus
    pipeline runs before tokenizer/vocab construction. PMI compares the
    bigram's joint probability against independence:
    ln(p(w1,w2) / (p(w1)·p(w2))), floored at {_PMI_MIN_COUNT} occurrences.

    Scale shape: bigrams are formed MAP-SIDE by adjacent-pair zip on the
    token array (no self-join, no per-doc window sort); unigram and
    bigram counts are partial+final hash aggs; the two c1/c2 attachments
    are plain equi-joins on the word key (AQE broadcasts the unigram side
    when it fits; with an unbounded typo-tail vocabulary both stay
    shuffle joins — never a driver collect). Totals are a 1-row broadcast.
    The PMI expression is evaluated with a fixed op order on exact
    integer inputs → identical IEEE doubles on both engines. Final top-k
    is TakeOrderedAndProject, never a global sort."""
    arrs = spark.table("documents").select(
        "doc_id", F.split("text", " ").alias("arr")
    )
    big = (
        # size >= 2 guard: for a 1-token doc sequence(0, -1) would yield the
        # DESCENDING array [0, -1] and emit two spurious null-word bigrams
        # the oracle never produces (latent on fixtures with >=10-token docs).
        arrs.filter(F.size("arr") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("arr") - 2),
                    lambda i: F.struct(
                        F.col("arr")[i].alias("w1"),
                        F.col("arr")[i + 1].alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    uni = (
        arrs.select(F.explode("arr").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_big = big.agg(F.sum("c12").alias("n_big"))
    return (
        big.filter(F.col("c12") >= _PMI_MIN_COUNT)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.expr(_SQL_PMI).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOP_K)
    )


# ---------------------------------------------------------------------------
# RAKE keyphrase extraction
# ---------------------------------------------------------------------------

_RAKE_STOPS = ("the", "a")
_RAKE_MAX_PHRASE = 8
_RAKE_TOP_K = 20

#: word score = degree/frequency, rounded onto the 6dp grid BEFORE the
#: cross-word phrase sum (which then runs in DECIMAL — exact,
#: order-independent; the module's standard float discipline).
_SQL_RAKE_WORD = "round(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE), 6)"


@query(
    "text_keyphrase_rake",
    oracle=f"""
    WITH arrs AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents
    ), tok AS (
      SELECT doc_id, pos, arr[pos] AS w,
             arr[pos] IN {_RAKE_STOPS} AS is_stop
      FROM arrs, LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS pos) s
    ), marked AS (
      SELECT doc_id, pos, w, is_stop,
             count(*) FILTER (WHERE is_stop)
               OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
      FROM tok
    ), seg AS (
      SELECT doc_id, pos, w, phrase_id FROM marked WHERE NOT is_stop
    ), ph AS (
      SELECT doc_id, phrase_id,
             string_agg(w, ' ' ORDER BY pos) AS phrase,
             count(*) AS plen
      FROM seg GROUP BY doc_id, phrase_id
    ), kept AS (
      SELECT * FROM ph WHERE plen <= {_RAKE_MAX_PHRASE}
    ), occ AS (
      SELECT s.doc_id, s.phrase_id, s.w, k.plen
      FROM seg s JOIN kept k USING (doc_id, phrase_id)
    ), ws AS (
      SELECT w, sum(plen) AS deg, count(*) AS freq FROM occ GROUP BY w
    ), scored AS (
      SELECT k.doc_id, k.phrase_id, k.phrase,
             sum(CAST({_SQL_RAKE_WORD} AS DECIMAL(18,6))) AS score_dec
      FROM occ o
        JOIN ws USING (w)
        JOIN kept k ON k.doc_id = o.doc_id AND k.phrase_id = o.phrase_id
      GROUP BY k.doc_id, k.phrase_id, k.phrase
    )
    SELECT phrase,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(max(score_dec) AS DOUBLE) AS score
    FROM scored
    GROUP BY phrase
    ORDER BY score DESC, phrase LIMIT {_RAKE_TOP_K}
    """,
)
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): split documents into
    candidate phrases at stopword boundaries, score each word by
    degree/frequency over the phrase graph (degree = Σ length of phrases
    containing it), score a phrase as the sum of its word scores, and
    return the corpus top-{_RAKE_TOP_K} — the unsupervised keyword pass a
    corpus-curation pipeline runs for topic tagging without a model.
    Word scores round onto the 6dp grid BEFORE the phrase sum, which
    accumulates in DECIMAL — exact and order-independent on both engines
    (identical phrase occurrences score identically, so max==every).

    Scale shape: segmentation is one per-doc window pass (running stop
    count inside the doc_id exchange — gaps-and-islands, the
    sessionization shape); phrase assembly groups on the SAME
    (doc, phrase) partitioning; word stats are one vocab-sized
    map-side-combined agg; the score join is word-keyed (AQE broadcasts
    the vocab side while it fits, shuffle-joins at typo-tail scale);
    final top-k is TakeOrderedAndProject. Phrase length is capped at
    {_RAKE_MAX_PHRASE}, so per-row payloads stay bounded."""
    arrs = spark.table("documents").select(
        "doc_id", F.split("text", " ").alias("arr")
    )
    tok = arrs.select(
        "doc_id", F.posexplode("arr").alias("pos", "w")
    ).withColumn("is_stop", F.col("w").isin(*_RAKE_STOPS))
    w_doc = W.partitionBy("doc_id").orderBy("pos")
    seg = (
        tok.withColumn(
            "phrase_id",
            F.count(F.when(F.col("is_stop"), 1)).over(w_doc),
        )
        .filter(~F.col("is_stop"))
        .select("doc_id", "phrase_id", "pos", "w")
    )
    ph = (
        seg.groupBy("doc_id", "phrase_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("phrase"),
            F.count("*").alias("plen"),
        )
        .filter(F.col("plen") <= _RAKE_MAX_PHRASE)
    )
    occ = seg.join(ph.select("doc_id", "phrase_id", "plen"), ["doc_id", "phrase_id"])
    ws = occ.groupBy("w").agg(
        F.sum("plen").alias("deg"), F.count("*").alias("freq")
    )
    scored = (
        occ.join(ws, "w")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.sum(F.expr(_SQL_RAKE_WORD).cast("decimal(18,6)")).alias(
                "score_dec"
            )
        )
        .join(ph, ["doc_id", "phrase_id"])
    )
    return (
        scored.groupBy("phrase")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.max("score_dec").cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(_RAKE_TOP_K)
    )


# ---------------------------------------------------------------------------
# group-median imputation
# ---------------------------------------------------------------------------

#: Deterministic "missingness" mask for the synthetic data (the testdata
#: has no real nulls): every 97th event's value is treated as missing.
_IMPUTE_MASK_MOD = 97


@query(
    "clean_impute_group_median",
    oracle=f"""
    WITH masked AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % {_IMPUTE_MASK_MOD} = 0 THEN NULL
                  ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS vi
      FROM events
    ), dom AS (
      SELECT event_type, vi, count(*) AS cnt FROM masked
      WHERE vi IS NOT NULL GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, vi,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY vi) AS c
      FROM dom
    ), n AS (
      SELECT event_type, count(*) AS n FROM masked
      WHERE vi IS NOT NULL GROUP BY 1
    ), med AS (
      SELECT event_type, min(vi) AS med_i
      FROM cum JOIN n USING (event_type)
      WHERE c >= (n + 1) // 2 GROUP BY event_type
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE vi IS NULL) AS BIGINT) AS n_imputed,
           CAST(max(med_i) AS DOUBLE) / 100.0 AS imputed_value,
           CAST(CAST(sum(coalesce(vi, med_i)) AS DOUBLE) / 100.0 AS DOUBLE)
             AS sum_after_impute
    FROM masked JOIN med USING (event_type)
    GROUP BY event_type ORDER BY event_type
    """,
)
def clean_impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation: missing values (deterministic mask — the
    synthetic data has no real nulls) fill with their group's EXACT
    discrete median — the robust imputation a feature pipeline prefers
    over group means when the column is heavy-tailed. Medians come from
    the compressed (type, value-grid) domain (the events_anomaly_mad
    machinery); the post-impute checksum rides the integer grid, so the
    whole repair is bit-exact across engines.

    Scale shape: one map-side-combined domain agg + partitioned running
    counts for the medians (never a sort of the facts), then the
    medians broadcast back for a map-only coalesce; the audit aggregate
    is type-catalog-bounded."""
    masked = spark.table("events").select(
        "event_type",
        F.when(
            F.col("event_id") % _IMPUTE_MASK_MOD == 0, F.lit(None)
        )
        .otherwise(F.floor(F.col("value") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("vi"),
    )
    present = masked.filter(F.col("vi").isNotNull())
    dom = present.groupBy("event_type", "vi").agg(F.count("*").alias("cnt"))
    wt = (
        W.partitionBy("event_type")
        .orderBy("vi")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = dom.withColumn("c", F.sum("cnt").over(wt))
    n = present.groupBy("event_type").agg(F.count("*").alias("n"))
    med = (
        cum.join(F.broadcast(n), "event_type")
        .filter(F.col("c") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("vi").alias("med_i"))
    )
    return (
        masked.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count(F.when(F.col("vi").isNull(), 1))
            .cast("long")
            .alias("n_imputed"),
            (F.max("med_i").cast("double") / 100.0).alias("imputed_value"),
            (
                F.sum(F.coalesce("vi", "med_i")).cast("double") / 100.0
            ).alias("sum_after_impute"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------

_K_ANON = 5


@query(
    "privacy_k_anonymity",
    oracle=f"""
    WITH qi AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(floor(value / 50) AS BIGINT) AS value_band,
             count(*) AS grp
      FROM events GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(grp) AS BIGINT) AS min_class_size,
           CAST(count(*) FILTER (WHERE grp < {_K_ANON}) AS BIGINT)
             AS n_violating_classes,
           CAST(sum(grp) FILTER (WHERE grp < {_K_ANON}) AS BIGINT)
             AS n_rows_at_risk,
           round(CAST(count(*) FILTER (WHERE grp >= {_K_ANON}) AS DOUBLE)
                 / nullif(CAST(count(*) AS DOUBLE), 0.0), 6)
             AS share_k_anonymous
    FROM qi
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of a quasi-identifier projection (event type ×
    day × banded value, k={_K_ANON}): equivalence-class sizes, the
    classes below k, and the row count they expose — the release-gate
    check a privacy review runs before publishing an aggregate extract
    (classes smaller than k re-identify; the value band is the
    generalization knob). Counts are exact ints; the one share is a
    single rounded division.

    Scale shape: ONE map-side-combined aggregate builds the
    equivalence-class histogram (shuffle volume = distinct QI tuples,
    bounded by type × calendar × band grid, ≪ rows), then a 1-row
    summary over it. Tightening or widening the QI changes the grouping
    expression, never the plan shape."""
    qi = spark.table("events").groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        F.floor(F.col("value") / 50).cast("long").alias("value_band"),
    ).agg(F.count("*").alias("grp"))
    viol = F.col("grp") < _K_ANON
    return qi.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.min("grp").cast("long").alias("min_class_size"),
        F.count(F.when(viol, 1)).cast("long").alias("n_violating_classes"),
        F.sum(F.when(viol, F.col("grp"))).cast("long").alias("n_rows_at_risk"),
        # try_divide + oracle nullif: an EMPTY events table (the r10
        # empty-increment corpus) makes this 0/0 — the audit still emits
        # its 1-row report (n_classes=0), with a NULL share on both
        # engines instead of an ANSI abort here vs NaN there.
        F.round(
            F.try_divide(
                F.count(F.when(~viol, 1)).cast("double"),
                F.count("*").cast("double"),
            ),
            6,
        ).alias("share_k_anonymous"),
    )


# ---------------------------------------------------------------------------
# r8: C4/Gopher-style rule filter with drop attribution; l-diversity
# ---------------------------------------------------------------------------

#: Gopher-style rule bounds (Rae et al. 2021 §A1.1, adapted): min doc
#: length in words, mean word length band, repetition cap (top token ≤
#: 20% of tokens), lexical-diversity floor (≥30% distinct).
_C4_MIN_WORDS = 20
_C4_WLEN_LO, _C4_WLEN_HI = 3, 10  # mean chars/word, integer-cross-mult'd
_C4_REP_MAX_X5 = 5  # top-token count × 5 ≤ n_tokens
_C4_DIV_X10 = 3  # n_distinct × 10 ≥ 3 × n_tokens


@query(
    "filter_c4_style",
    oracle=f"""
    WITH f AS (
      SELECT source,
             len(string_split(text, ' ')) AS nt,
             len(list_distinct(string_split(text, ' '))) AS nd,
             len(replace(text, ' ', '')) AS nc,
             list_max(list_transform(
               list_distinct(string_split(text, ' ')),
               w -> len(list_filter(string_split(text, ' '), x -> x = w))))
               AS topc
      FROM documents
    ),
    ruled AS (
      SELECT source,
             CASE
               WHEN nt < {_C4_MIN_WORDS} THEN 'short'
               WHEN nc < {_C4_WLEN_LO} * nt
                 OR nc > {_C4_WLEN_HI} * nt THEN 'wordlen'
               WHEN topc * {_C4_REP_MAX_X5} > nt THEN 'repetitive'
               WHEN nd * 10 < {_C4_DIV_X10} * nt THEN 'lowdiv'
               ELSE 'kept'
             END AS verdict
      FROM f
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE verdict = 'kept') AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE verdict = 'short') AS BIGINT) AS n_drop_short,
           CAST(count(*) FILTER (WHERE verdict = 'wordlen') AS BIGINT) AS n_drop_wordlen,
           CAST(count(*) FILTER (WHERE verdict = 'repetitive') AS BIGINT) AS n_drop_repetitive,
           CAST(count(*) FILTER (WHERE verdict = 'lowdiv') AS BIGINT) AS n_drop_lowdiv
    FROM ruled GROUP BY source ORDER BY source
    """,
)
def filter_c4_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality gate with first-failing-rule attribution,
    rolled up per source: short-doc floor, mean-word-length band,
    repetition cap (top token ≤ 20%), lexical-diversity floor — the
    rule filter (and its drop ledger, which is what you actually debug)
    every web-scale corpus pass runs before training. Every rule is an
    INTEGER cross-multiplication (mean word length as nc ≥ 3·nt, never
    a float division), so the verdict is exact on both engines.

    Scale shape: map-only feature extraction per doc (token stats from
    one split; the top-token count is an O(distinct·tokens) in-row
    higher-order fold — JVM-side, no explode, no shuffle), then ONE
    map-side-combined rollup onto the bounded source domain."""
    s = F.split(F.col("text"), " ")
    nt = F.size(s)
    nd = F.size(F.array_distinct(s))
    nc = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    topc = F.array_max(
        F.transform(
            F.array_distinct(s),
            lambda w: F.size(F.filter(s, lambda x: x == w)),
        )
    )
    verdict = (
        F.when(nt < _C4_MIN_WORDS, "short")
        .when((nc < _C4_WLEN_LO * nt) | (nc > _C4_WLEN_HI * nt), "wordlen")
        .when(topc * _C4_REP_MAX_X5 > nt, "repetitive")
        .when(nd * 10 < _C4_DIV_X10 * nt, "lowdiv")
        .otherwise("kept")
    )
    ruled = spark.table("documents").select("source", verdict.alias("verdict"))
    cnt = lambda v: F.count(F.when(F.col("verdict") == v, 1)).cast("long")  # noqa: E731
    return (
        ruled.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            cnt("kept").alias("n_kept"),
            cnt("short").alias("n_drop_short"),
            cnt("wordlen").alias("n_drop_wordlen"),
            cnt("repetitive").alias("n_drop_repetitive"),
            cnt("lowdiv").alias("n_drop_lowdiv"),
        )
        .orderBy("source")
    )


_L_DIV = 3


@query(
    "privacy_l_diversity",
    oracle=f"""
    WITH qi AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(floor(value / 50) AS BIGINT) AS value_band,
             count(*) AS grp,
             count(DISTINCT user_id) AS l
      FROM events GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(count(*) FILTER (WHERE l < {_L_DIV}) AS BIGINT)
             AS n_violating_classes,
           CAST(coalesce(sum(grp) FILTER (WHERE l < {_L_DIV}), 0) AS BIGINT)
             AS n_rows_at_risk,
           round(CAST(count(*) FILTER (WHERE l >= {_L_DIV}) AS DOUBLE)
                 / nullif(CAST(count(*) AS DOUBLE), 0.0), 6)
             AS share_l_diverse
    FROM qi
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l={_L_DIV}) over the same quasi-identifier
    projection as privacy_k_anonymity: beyond class SIZE, each QI class
    must contain ≥ l distinct sensitive values (user_id here) — the
    follow-up check that catches k-anonymous classes where everyone is
    the same person. Counts are exact ints; one rounded share.

    Scale shape: one aggregate with a distinct-count per QI class
    (partial+final; the distinct shuffles (QI, user) pairs — bounded by
    class grid × active users per class), then a 1-row summary."""
    qi = spark.table("events").groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        F.floor(F.col("value") / 50).cast("long").alias("value_band"),
    ).agg(
        F.count("*").alias("grp"),
        F.countDistinct("user_id").alias("l"),
    )
    viol = F.col("l") < _L_DIV
    return qi.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.min("l").cast("long").alias("min_l"),
        F.count(F.when(viol, 1)).cast("long").alias("n_violating_classes"),
        F.coalesce(F.sum(F.when(viol, F.col("grp"))), F.lit(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        # try_divide + oracle nullif: empty-input 0/0 guard (r10 empty
        # corpus) — NULL share on both engines, report row preserved.
        F.round(
            F.try_divide(
                F.count(F.when(~viol, 1)).cast("double"),
                F.count("*").cast("double"),
            ),
            6,
        ).alias("share_l_diverse"),
    )


# ---------------------------------------------------------------------------
# r8b: hashing-trick feature buckets (portable sha256 hash)
# ---------------------------------------------------------------------------


@query(
    "ml_feature_hashing",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    hashed AS (
      SELECT substr(sha256(w), 1, 1) AS bucket,
             CASE WHEN substr(sha256(w), 2, 1) < '8' THEN 1 ELSE -1 END
               AS sign,
             w
      FROM tok
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(sign) AS BIGINT) AS signed_sum,
           CAST(count(DISTINCT w) AS BIGINT) AS n_distinct_tokens
    FROM hashed GROUP BY bucket ORDER BY bucket
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick feature aggregation (Weinberger et al., ICML'09):
    every token maps to one of 16 buckets by hash, with a second hash
    bit giving the ±1 sign that keeps collision noise zero-mean — the
    fixed-width featurizer that replaces an unbounded vocabulary with a
    constant-size vector at any corpus scale. The hash is PORTABLE
    sha256 hex (bucket = first hex char, sign = second hex char < '8'),
    so both engines compute identical assignments with no
    engine-specific hash anywhere.

    Scale shape: explode → one map-side-combined aggregate onto the
    16-bucket domain (the distinct-token count shuffles (bucket, token)
    pairs — vocabulary-bounded). Unbounded-vocabulary pathologies are
    exactly what the fixed bucket space removes."""
    sha = F.sha2(F.col("w"), 256)
    hashed = (
        spark.table("documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .select(
            F.substring(sha, 1, 1).alias("bucket"),
            F.when(F.substring(sha, 2, 1) < "8", 1).otherwise(-1).alias("sign"),
            "w",
        )
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("sign").cast("long").alias("signed_sum"),
            F.countDistinct("w").cast("long").alias("n_distinct_tokens"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# r8d: capacity-strict sequence packing (first-fit-decreasing)
# ---------------------------------------------------------------------------

#: Context length (whitespace tokens) each packed training sequence holds.
_PACK_CONTEXT = 256
#: Parallel packer groups; scales with the cluster (each packer bin-packs
#: its hash slice independently).
_PACK_GROUPS = 32


@query(
    "pack_sequences_ffd",
    # First-fit-decreasing IS sequential, but it is also DETERMINISTIC —
    # so the oracle replays the identical item-by-item simulation as a
    # recursive CTE (one recursion step per document, state = per-group
    # residual/ndocs lists) and the driver value-checks the full per-bin
    # manifest. This retires the operator's former rows-only status.
    oracle=f"""
    WITH RECURSIVE
    d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(CAST(('0x' || substr(sha256('pack:' || CAST(doc_id AS VARCHAR)), 1, 4))
                       AS INTEGER) % {_PACK_GROUPS} AS INTEGER) AS packer
      FROM documents
    ),
    grp AS (
      SELECT packer, list(n_tokens ORDER BY n_tokens DESC, doc_id) AS items
      FROM d GROUP BY packer
    ),
    sim AS (
      SELECT packer, items, 0 AS i,
             []::BIGINT[] AS residual, []::BIGINT[] AS ndocs
      FROM grp
      UNION ALL
      SELECT packer, items, i,
             CASE WHEN fit IS NULL
                  THEN list_append(residual, greatest({_PACK_CONTEXT} - t, 0))
                  ELSE list_transform(range(1, len(residual) + 1),
                         j -> CASE WHEN j = fit THEN residual[j] - t
                                   ELSE residual[j] END) END,
             CASE WHEN fit IS NULL
                  THEN list_append(ndocs, 1)
                  ELSE list_transform(range(1, len(ndocs) + 1),
                         j -> CASE WHEN j = fit THEN ndocs[j] + 1
                                   ELSE ndocs[j] END) END
      FROM (
        SELECT packer, items, i + 1 AS i, residual, ndocs,
               items[i + 1] AS t,
               list_filter(range(1, len(residual) + 1),
                           j -> residual[j] >= items[i + 1])[1] AS fit
        FROM sim WHERE i < len(items)
      )
    ),
    fin AS (SELECT packer, residual, ndocs FROM sim WHERE i = len(items)),
    bins AS (
      SELECT packer, CAST(j - 1 AS BIGINT) AS bin_id,
             CAST(ndocs[j] AS BIGINT) AS n_docs,
             CAST({_PACK_CONTEXT} - residual[j] AS BIGINT) AS bin_tokens,
             floor(({_PACK_CONTEXT} - residual[j]) / {_PACK_CONTEXT}.0
                   * 1000000 + 0.5) / 1000000 AS fill_rate
      FROM fin, LATERAL (SELECT unnest(range(1, len(residual) + 1)) AS j) s
    )
    SELECT packer, bin_id, n_docs, bin_tokens, fill_rate FROM bins
    """,
)
def pack_sequences_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity-strict sequence packing: first-fit-decreasing bin packing
    of documents into {_PACK_CONTEXT}-token training sequences — the
    padding-waste reducer every LLM pre-training loader runs (unlike
    `pack_token_shards`, which lets a document straddle a shard budget,
    every bin here is guaranteed ≤ context, so a bin IS a batch row).

    Distributed layout: documents hash into {_PACK_GROUPS} packer groups
    (deterministic xxhash64 — reproducible across runs and cluster
    sizes); each group runs classical FFD on its slice inside ONE
    Arrow-batched `applyInPandas` pass (sort by length desc, first bin
    that fits; overlong documents would get flagged singleton bins —
    the fixture has none at this context). FFD is inherently a
    sequential scan, so the group hash is the parallelism knob: at
    100 TB, pick P so a group's (doc_id, n_tokens) pairs — NOT bodies;
    packing needs only lengths — fit one task, and the 11/9·OPT + 6/9
    FFD bound holds per group, so total bins stay within ~22% of the
    global optimum while groups pack embarrassingly parallel. Output
    is the per-bin manifest (id list omitted; join `assignment`-style
    output downstream if bodies are needed).

    Value-exact despite the loop-carried state: FFD is deterministic
    given (sorted lengths, group assignment), so the ORACLE replays the
    same simulation as a DuckDB recursive CTE — one recursion step per
    document, carrying residual/ndocs lists per group — and the driver
    hashes the full per-bin manifest. Group assignment uses the repo's
    cross-engine sha256-prefix hash (not xxhash64, which only Spark can
    compute) so both engines pack identical groups. The analytic
    invariants (capacity, token-mass conservation, 11/9·OPT bound)
    remain pinned in `test_pack_sequences_ffd_invariants`."""
    import math

    import pandas as pd

    context = _PACK_CONTEXT

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        residual: list[int] = []
        n_docs: list[int] = []
        for t in pdf["n_tokens"]:
            t = int(t)
            placed = False
            # linear first-fit; a segment tree over residuals makes this
            # O(log bins) per doc when a group's bin count is large
            for i, r in enumerate(residual):
                if r >= t:
                    residual[i] = r - t
                    n_docs[i] += 1
                    placed = True
                    break
            if not placed:
                residual.append(max(context - t, 0))
                n_docs.append(1)
        packer = int(pdf["packer"].iloc[0])
        toks = [context - r for r in residual]
        # IEEE half-up rounding (not Python's banker's round): t/context
        # has an exact 8-decimal binary expansion, so exact .5 remainders
        # at the 6th decimal occur and the engines must break them alike.
        return pd.DataFrame(
            {
                "packer": packer,
                "bin_id": range(len(residual)),
                "n_docs": n_docs,
                "bin_tokens": toks,
                "fill_rate": [
                    math.floor(t / context * 1e6 + 0.5) / 1e6 for t in toks
                ],
            }
        )

    d = spark.table("documents").select(
        "doc_id",
        F.size(_words()).cast("long").alias("n_tokens"),
        # cross-engine group hash (sha256 prefix, the _hash_bucket idiom)
        # so the oracle's recursive replay packs the identical groups
        (
            F.conv(
                F.substring(
                    F.sha2(
                        F.concat(F.lit("pack:"), F.col("doc_id").cast("string")),
                        256,
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("int")
            % _PACK_GROUPS
        )
        .cast("int")
        .alias("packer"),
    )
    return d.groupBy("packer").applyInPandas(
        ffd,
        "packer int, bin_id bigint, n_docs bigint, bin_tokens bigint, "
        "fill_rate double",
    )


# ---------------------------------------------------------------------------
# r8d: Dunning log-likelihood-ratio collocations
# ---------------------------------------------------------------------------

_LLR_MIN_COUNT = 5
_LLR_TOP_K = 20

#: Shannon x·ln(x) with the 0·ln0 = 0 convention, as shared SQL text so
#: both engines evaluate the IDENTICAL expression tree.
def _sql_xlogx(k: str) -> str:
    return f"(CASE WHEN {k} > 0 THEN CAST({k} AS DOUBLE) * ln(CAST({k} AS DOUBLE)) ELSE 0.0 END)"


#: Dunning (1993) G²: 2·(Σ xlogx(cell) − Σ xlogx(row) − Σ xlogx(col)
#: + xlogx(N)) over the 2×2 bigram contingency table — one fixed-order
#: per-row expression on exact integer counts, no cross-row FP summation.
_SQL_LLR = (
    "round(2.0 * ("
    + " + ".join(
        _sql_xlogx(k)
        for k in ("c12", "c1 - c12", "c2 - c12", "n_big - c1 - c2 + c12")
    )
    + f" + {_sql_xlogx('n_big')}"
    + f" - {_sql_xlogx('c1')} - {_sql_xlogx('n_big - c1')}"
    + f" - {_sql_xlogx('c2')} - {_sql_xlogx('n_big - c2')}"
    + "), 6)"
)


@query(
    "text_collocation_llr",
    oracle=f"""
    WITH arrs AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ), pairs AS (
      SELECT arr[i] AS w1, arr[i + 1] AS w2
      FROM arrs, LATERAL (SELECT unnest(range(1, len(arr))) AS i) s
    ), big AS (
      SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2
    ), rowm AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY 1),
    colm AS (SELECT w2, sum(c12) AS c2 FROM big GROUP BY 1),
    n AS (SELECT sum(c12) AS n_big FROM big),
    joined AS (
      SELECT big.w1, big.w2, c12, c1, c2, n_big
      FROM big
        JOIN rowm ON rowm.w1 = big.w1
        JOIN colm ON colm.w2 = big.w2
        CROSS JOIN n
      WHERE c12 >= {_LLR_MIN_COUNT}
    )
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, {_SQL_LLR} AS llr
    FROM joined
    ORDER BY llr DESC, w1, w2 LIMIT {_LLR_TOP_K}
    """,
)
def text_collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_LLR_TOP_K} collocations by Dunning's log-likelihood ratio
    (Dunning, "Accurate Methods for the Statistics of Surprise and
    Coincidence", CL 1993) — the statistically-sound complement to PMI
    for phrase mining: G² scores the full 2×2 bigram contingency table,
    so it does NOT over-reward rare pairs the way raw PMI does (the
    hapax problem PMI handles with a count floor) and remains valid at
    very skewed margins.

    Scale shape: identical to `text_pmi_bigrams` — map-side
    adjacent-pair zip (no self-join), partial+final hash aggs for the
    bigram table and its row/col margins, word-keyed margin joins (AQE
    broadcasts when the vocabulary fits), a 1-row total broadcast, and
    TakeOrderedAndProject for the top-k. The G² expression itself is
    shared SQL text on exact integer counts (xlogx terms in one fixed
    per-row tree, no cross-row FP sums), so both engines produce
    identical IEEE doubles."""
    arrs = spark.table("documents").select(
        "doc_id", F.split("text", " ").alias("arr")
    )
    big = (
        arrs.filter(F.size("arr") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("arr") - 2),
                    lambda i: F.struct(
                        F.col("arr")[i].alias("w1"),
                        F.col("arr")[i + 1].alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .localCheckpoint(eager=False)  # feeds margins AND the scored join
    )
    rowm = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    colm = big.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n = big.agg(F.sum("c12").alias("n_big"))
    return (
        big.filter(F.col("c12") >= _LLR_MIN_COUNT)
        .join(rowm, "w1")
        .join(colm, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.expr(_SQL_LLR).alias("llr"),
        )
        .orderBy(F.desc("llr"), "w1", "w2")
        .limit(_LLR_TOP_K)
    )


# ---------------------------------------------------------------------------
# r8d: multinomial Naive Bayes language classifier (train + score)
# ---------------------------------------------------------------------------

#: Train on odd doc_ids, score the evens (held-out split convention).
_NB_TRAIN_MOD = 2


@query(
    "ml_naive_bayes_langid",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    train AS (SELECT * FROM tok WHERE doc_id % {_NB_TRAIN_MOD} = 1),
    cwc AS (SELECT lang, w, count(*) AS c FROM train GROUP BY 1, 2),
    tot AS (SELECT lang, count(*) AS t FROM train GROUP BY 1),
    vocab AS (SELECT count(DISTINCT w) AS v FROM train),
    prior AS (
      SELECT lang, count(DISTINCT doc_id) AS nd FROM train GROUP BY 1
    ),
    ndocs AS (SELECT count(DISTINCT doc_id) AS n FROM train),
    pr AS (
      SELECT p.lang,
             round(ln(CAST(p.nd AS DOUBLE) / n.n), 12) AS lp
      FROM prior p CROSS JOIN ndocs n
    ),
    dw AS (
      SELECT doc_id, lang AS true_lang, w, count(*) AS cnt
      FROM tok WHERE doc_id % {_NB_TRAIN_MOD} = 0 GROUP BY 1, 2, 3
    ),
    grid AS (
      SELECT dw.doc_id, dw.true_lang, dw.w, dw.cnt, t.lang, t.t, v.v
      FROM dw CROSS JOIN tot t CROSS JOIN vocab v
    ),
    terms AS (
      SELECT g.doc_id, g.true_lang, g.lang,
             CAST(round(g.cnt * round(ln((coalesce(cwc.c, 0) + 1.0)
                                         / (g.t + g.v)), 12), 12)
                  AS DECIMAL(28,12)) AS term
      FROM grid g
        LEFT JOIN cwc ON cwc.lang = g.lang AND cwc.w = g.w
    ),
    scores AS (
      SELECT s.doc_id, s.true_lang, s.lang,
             CAST(sum(s.term) AS DOUBLE) + pr.lp AS score
      FROM terms s JOIN pr ON pr.lang = s.lang
      GROUP BY s.doc_id, s.true_lang, s.lang, pr.lp
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS rnk
      FROM scores
    )
    SELECT doc_id, true_lang, lang AS predicted_lang,
           (lang = true_lang) AS correct,
           round(score, 6) AS score
    FROM ranked WHERE rnk = 1 ORDER BY doc_id
    """,
)
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language identification, trained and
    scored in one plan: word-class counts with Laplace smoothing from
    the odd-doc_id half, argmax posterior over the even half — the
    classical supervised counterpart of the heuristic `text_lang_id`,
    and the shape of every counting-based quality/topic/language
    classifier a corpus pipeline trains on labeled slices.

    Cross-engine exactness: every log-likelihood rounds onto the 12dp
    grid, per-word terms scale by exact integer counts and re-round,
    and per-(doc, class) scores sum those grid terms in DECIMAL(28,12)
    — order-free, so the argmax compares identical doubles on both
    engines (ties break by class name).

    Scale shape: training is two token-keyed hash aggs (word-class
    counts + class totals — partial+final, never a collect: the model
    IS a DataFrame); scoring joins the test docs' (doc, word, count)
    relation against the model on the word key (AQE broadcasts a
    bounded vocabulary; an unbounded one stays a shuffle join), with
    the K-class grid as a broadcast cross — cost is test-tokens × K.
    The argmax is a doc-keyed window. Both halves scan the corpus
    once."""
    tok = spark.table("documents").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    train = tok.filter(F.col("doc_id") % _NB_TRAIN_MOD == 1)
    cwc = train.groupBy("lang", "w").agg(F.count("*").alias("c"))
    tot = train.groupBy("lang").agg(F.count("*").alias("t"))
    vocab = train.agg(F.countDistinct("w").alias("v"))
    prior = train.groupBy("lang").agg(F.countDistinct("doc_id").alias("nd"))
    ndocs = train.agg(F.countDistinct("doc_id").alias("n"))
    pr = prior.crossJoin(F.broadcast(ndocs)).select(
        "lang",
        F.round(F.log(F.col("nd").cast("double") / F.col("n")), 12).alias("lp"),
    )
    dw = (
        tok.filter(F.col("doc_id") % _NB_TRAIN_MOD == 0)
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "w")
        .agg(F.count("*").alias("cnt"))
    )
    grid = dw.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(vocab))
    terms = grid.join(
        cwc.select("lang", "w", "c"), ["lang", "w"], "left"
    ).select(
        "doc_id",
        "true_lang",
        "lang",
        F.round(
            F.col("cnt")
            * F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                    / (F.col("t") + F.col("v"))
                ),
                12,
            ),
            12,
        )
        .cast("decimal(28,12)")
        .alias("term"),
    )
    scores = (
        terms.groupBy("doc_id", "true_lang", "lang")
        .agg(F.sum("term").cast("double").alias("s"))
        .join(F.broadcast(pr), "lang")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            (F.col("s") + F.col("lp")).alias("score"),
        )
    )
    ranked = scores.withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.desc("score"), "lang")
        ),
    )
    return (
        ranked.filter(F.col("rnk") == 1)
        .select(
            "doc_id",
            "true_lang",
            F.col("lang").alias("predicted_lang"),
            (F.col("lang") == F.col("true_lang")).alias("correct"),
            F.round("score", 6).alias("score"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# r8d: rare-category collapse (cardinality capping for feature prep)
# ---------------------------------------------------------------------------

_RARE_MIN_SUPPORT = 5
_RARE_OTHER = "__OTHER__"


@query(
    "clean_rare_category_collapse",
    oracle=f"""
    WITH cat AS (
      SELECT source || '/' || lang AS category FROM documents
    ),
    counts AS (SELECT category, count(*) AS c FROM cat GROUP BY 1),
    mapped AS (
      SELECT CASE WHEN c >= {_RARE_MIN_SUPPORT} THEN category
                  ELSE '{_RARE_OTHER}' END AS category_out,
             category, c
      FROM counts
    )
    SELECT category_out,
           CAST(sum(c) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_source_categories
    FROM mapped GROUP BY 1 ORDER BY category_out
    """,
)
def clean_rare_category_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-category collapse: composite (source/lang) categories with
    support below {_RARE_MIN_SUPPORT} fold into a single
    '{_RARE_OTHER}' bucket — the cardinality cap every feature
    pipeline applies before one-hot/target encoding so unseen or
    near-empty categories cannot leak noise into a model (and the
    vocabulary-OOV bucketing shape in token pipelines). Output is the
    recoded distribution audit: surviving categories keep their own
    row; the OTHER row reports how many raw categories it absorbed.
    The fixture splits 42 kept / 55 collapsed at sf0.01 — both
    branches carry evidence.

    Scale shape: one hash agg to category counts (category-domain-
    bounded), a map-side CASE recode, one re-agg on the recoded key.
    Facts are scanned once; in a pipeline the kept-category list is
    the broadcast dictionary downstream encoders join against."""
    # F.concat (NULL-propagating, matching SQL ||), NOT concat_ws (which
    # skips NULLs): a NULL source/lang must land in the same NULL bucket
    # on both engines.
    cat = spark.table("documents").select(
        F.concat(F.col("source"), F.lit("/"), F.col("lang")).alias("category")
    )
    counts = cat.groupBy("category").agg(F.count("*").alias("c"))
    mapped = counts.select(
        F.when(F.col("c") >= _RARE_MIN_SUPPORT, F.col("category"))
        .otherwise(F.lit(_RARE_OTHER))
        .alias("category_out"),
        "c",
    )
    return (
        mapped.groupBy("category_out")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_source_categories"),
        )
        .orderBy("category_out")
    )


# ---------------------------------------------------------------------------
# r8d: differentially-private count release (Laplace mechanism plumbing)
# ---------------------------------------------------------------------------

_DP_EPSILON = 1.0
_DP_SEED = "dp-release-1"


@query(
    "privacy_dp_count_release",
    oracle=f"""
    WITH c AS (
      SELECT lang, count(*) AS n_true FROM documents GROUP BY lang
    ),
    u AS (
      SELECT lang, n_true,
             CAST(CAST('0x' || substr(sha256('{_DP_SEED}-' || lang), 1, 4)
                       AS INTEGER) AS DOUBLE) / 65536.0 AS uu
      FROM c
    ),
    lap AS (
      SELECT lang, n_true,
             CASE WHEN uu < 0.5 THEN 1.0 ELSE -1.0 END
             * (1.0 / {_DP_EPSILON})
             * ln(1.0 - 2.0 * least(abs(uu - 0.5), 0.499984741))
               AS noise
      FROM u
    )
    SELECT lang, CAST(n_true AS BIGINT) AS n_true,
           round(noise, 6) AS noise,
           round(n_true + noise, 6) AS released_count,
           CAST({_DP_EPSILON} AS DOUBLE) AS epsilon
    FROM lap ORDER BY lang
    """,
)
def privacy_dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism count release (Dwork et al. 2006): per-language
    document counts perturbed with Laplace(1/ε) noise via the inverse
    CDF — completing the privacy trio (k-anonymity suppresses,
    l-diversity audits, DP *releases*). The uniform draw is a seeded
    content hash, making the run DETERMINISTIC for the correctness
    gate and reproducible audits; a production release swaps the hash
    for a CSPRNG draw — the distributed plumbing (per-group noise, no
    collect, sensitivity-1 count queries) is what this operator pins,
    not the entropy source. True counts ride along because this is an
    engine test surface, not a privacy boundary.

    Exactness: the inverse-CDF expression (sign · (1/ε) ·
    ln(1 − 2|u−½|), |u−½| clamped below ½ so the u=½ lattice point
    cannot produce ln(0)) is a fixed tree on exact integer-ratio
    inputs — identical IEEE doubles on both engines, 6dp-rounded.

    Scale shape: one map-side-combined count onto the group domain,
    then a map-only noise expression per group row. Adding DP to any
    registered aggregate is this same per-output-row map."""
    c = spark.table("documents").groupBy("lang").agg(
        F.count("*").alias("n_true")
    )
    uu = (
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(f"{_DP_SEED}-"), F.col("lang")), 256),
                1,
                4,
            ),
            16,
            10,
        ).cast("double")
        / 65536.0
    )
    noise = (
        F.when(uu < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * (1.0 / _DP_EPSILON)
        * F.log(
            1.0 - 2.0 * F.least(F.abs(uu - 0.5), F.lit(0.499984741))
        )
    )
    return c.select(
        "lang",
        F.col("n_true").cast("long").alias("n_true"),
        F.round(noise, 6).alias("noise"),
        F.round(F.col("n_true") + noise, 6).alias("released_count"),
        F.lit(float(_DP_EPSILON)).alias("epsilon"),
    ).orderBy("lang")


#: t-closeness threshold as an exact rational: TVD > 1/5 ⟺ 5·S > 2·N_c·N
#: (S = Σ|n_cv·N − n_v·N_c|) — the violation verdict is an integer
#: cross-multiplication, never a float comparison.
_T_CLOSE_NUM, _T_CLOSE_DEN = 1, 5


@query(
    "privacy_t_closeness",
    oracle=f"""
    WITH cv AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(floor(value / 50) AS BIGINT) AS value_band,
             event_type, CAST(count(*) AS BIGINT) AS n_cv
      FROM events GROUP BY 1, 2, 3
    ), cls AS (
      SELECT day, value_band, CAST(sum(n_cv) AS BIGINT) AS n_c
      FROM cv GROUP BY 1, 2
    ), gl AS (
      SELECT event_type, CAST(sum(n_cv) AS BIGINT) AS n_v FROM cv GROUP BY 1
    ), tot AS (SELECT CAST(sum(n_v) AS BIGINT) AS n FROM gl),
    grid AS (
      SELECT cls.day, cls.value_band, cls.n_c, gl.event_type, gl.n_v,
             coalesce(cv.n_cv, 0) AS n_cv
      FROM cls CROSS JOIN gl
      LEFT JOIN cv ON cv.day = cls.day AND cv.value_band = cls.value_band
                  AND cv.event_type = gl.event_type
    ), perclass AS (
      SELECT day, value_band, n_c,
             sum(abs(CAST(n_cv AS DECIMAL(38,0)) * (SELECT n FROM tot)
                     - CAST(n_v AS DECIMAL(38,0)) * n_c)) AS s
      FROM grid GROUP BY 1, 2, 3
    ), scored AS (
      SELECT n_c, s,
             CAST(s AS DOUBLE)
               / (2.0 * CAST(n_c AS DOUBLE)
                  * CAST((SELECT n FROM tot) AS DOUBLE)) AS tvd,
             ({_T_CLOSE_DEN} * s
              > 2 * {_T_CLOSE_NUM} * CAST(n_c AS DECIMAL(38,0))
                * (SELECT n FROM tot)) AS viol
      FROM perclass
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           {{mx}} AS max_tvd,
           CAST(count(*) FILTER (WHERE viol) AS BIGINT) AS n_violating_classes,
           CAST(coalesce(sum(n_c) FILTER (WHERE viol), 0) AS BIGINT)
             AS n_rows_at_risk,
           {{sh}} AS share_t_close
    FROM scored
    """.format(
        mx=_sql_round_ieee("max(tvd)", 6),
        sh=_sql_round_ieee(
            "CAST(count(*) FILTER (WHERE NOT viol) AS DOUBLE)"
            " / nullif(CAST(count(*) AS DOUBLE), 0.0)", 6),
    ),
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (t = 1/5) completing the anonymity triad
    (privacy_k_anonymity → class size, privacy_l_diversity → sensitive
    cardinality, here → sensitive DISTRIBUTION): each quasi-identifier
    class's event-type distribution must stay within total-variation
    distance t of the global distribution — the check that catches
    classes that are large and diverse yet skewed enough to leak.

    Exactness: TVD_c = Σ_v |n_cv·N − n_v·N_c| / (2·N_c·N) — the
    numerator S is an exact DECIMAL(38,0) integer (absent sensitive
    values contribute n_v·N_c via the class×domain grid, so the L1 is
    over the FULL domain), and the t-violation verdict is the integer
    cross-multiplication 5·S > 2·N_c·N, never a float threshold.

    Scale shape: one (QI, sensitive) rollup, one QI rollup, one
    BROADCAST of the 5-row sensitive domain cross the bounded QI grid,
    one left join back — every relation after the first agg is
    class-grid-sized, facts are touched exactly once."""
    ev = spark.table("events")
    cv = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        F.floor(F.col("value") / 50).cast("long").alias("value_band"),
        "event_type",
    ).agg(F.count("*").cast("long").alias("n_cv"))
    cls = cv.groupBy("day", "value_band").agg(
        F.sum("n_cv").cast("long").alias("n_c")
    )
    glob = cv.groupBy("event_type").agg(F.sum("n_cv").cast("long").alias("n_v"))
    tot = glob.agg(F.sum("n_v").cast("long").alias("n"))
    grid = (
        cls.crossJoin(F.broadcast(glob))
        .join(cv, ["day", "value_band", "event_type"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "day", "value_band", "n_c", "n_v", "n",
            F.coalesce(F.col("n_cv"), F.lit(0)).alias("n_cv"),
        )
    )
    perclass = grid.groupBy("day", "value_band", "n_c", "n").agg(
        F.sum(
            F.abs(
                F.col("n_cv").cast("decimal(38,0)") * F.col("n")
                - F.col("n_v").cast("decimal(38,0)") * F.col("n_c")
            )
        ).alias("s")
    )
    tvd = F.col("s").cast("double") / (
        F.lit(2.0) * F.col("n_c").cast("double") * F.col("n").cast("double")
    )
    viol = (
        F.lit(_T_CLOSE_DEN) * F.col("s")
        > F.lit(2 * _T_CLOSE_NUM)
        * F.col("n_c").cast("decimal(38,0)")
        * F.col("n")
    )
    scored = perclass.select("n_c", tvd.alias("tvd"), viol.alias("viol"))
    return scored.agg(
        F.count("*").cast("long").alias("n_classes"),
        _round_ieee(F.max("tvd"), 6).alias("max_tvd"),
        F.count(F.when(F.col("viol"), 1)).cast("long").alias("n_violating_classes"),
        F.coalesce(F.sum(F.when(F.col("viol"), F.col("n_c"))), F.lit(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        # try_divide + oracle nullif: empty-input 0/0 guard (r10 empty
        # corpus) — NULL share on both engines, report row preserved.
        _round_ieee(
            F.try_divide(
                F.count(F.when(~F.col("viol"), 1)).cast("double"),
                F.count("*").cast("double"),
            ),
            6,
        ).alias("share_t_close"),
    )


_ZIPF_SLOPE = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
_ZIPF_ICEPT = (
    "((CAST(sy AS DOUBLE)"
    f"  - {_ZIPF_SLOPE} * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))"
)


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), vocab AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w
    ), cls AS (
      SELECT c, CAST(count(*) AS BIGINT) AS t FROM vocab GROUP BY c
    ), tot AS (SELECT CAST(sum(t) AS BIGINT) AS tt FROM cls),
    cum AS (
      SELECT c, t,
             sum(t) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS upto
      FROM cls
    ), pts AS (
      SELECT t,
             CAST({_sql_round_ieee(
                 "ln((CAST(2 * (tt - upto) + t + 1 AS DOUBLE)) / 2.0)", 6)}
               AS DECIMAL(12,6)) AS gx,
             CAST({_sql_round_ieee("ln(CAST(c AS DOUBLE))", 6)}
               AS DECIMAL(12,6)) AS gy
      FROM cum CROSS JOIN tot
    ), mom AS (
      SELECT CAST(sum(t) AS BIGINT) AS n,
             sum(t * gx) AS sx, sum(t * gy) AS sy,
             sum(t * (gx * gy)) AS sxy, sum(t * (gx * gx)) AS sxx
      FROM pts
    )
    SELECT n AS n_terms, {{sl}} AS zipf_slope, {{ic}} AS zipf_intercept
    FROM mom
    """.format(
        sl=_sql_round_ieee(_ZIPF_SLOPE, 6), ic=_sql_round_ieee(_ZIPF_ICEPT, 6)
    ),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: OLS slope of
    ln(frequency) on ln(rank) — the corpus-health diagnostic (natural
    text slopes ≈ −1; a synthetic or templated corpus shows up as a
    flat or kinked fit) every pretraining mix report includes.

    Rank ties are handled exactly: terms sharing a frequency share the
    MIDRANK of their frequency class, computed on the COUNT-OF-COUNTS
    domain (tiny — at most a few thousand distinct frequencies even at
    corpus scale) via one prefix pass, descending by construction
    (2·mr = 2·(T − upto) + t + 1). Per-class log points land on the
    1e-6 grid and every regression moment is an EXACT decimal sum of
    (class-weight × grid-product) terms — grid points carry
    DECIMAL(12,6), NOT (38,6): at p=38 the gx·gy product exceeds the
    exact decimal range and DuckDB silently degrades it to DOUBLE
    (order-dependent ulps — caught by the r9 sparse fixture). On the
    Spark side the weight and grid product are explicitly re-cast
    (t → decimal(17,0), gx·gy → decimal(20,12)) so every term stays
    decimal(38,12) — without the casts Spark's allowPrecisionLoss
    rounds each t·gx·gy term to 6dp while DuckDB sums the exact 12dp
    values (r10 ADVICE). The count-of-counts trick
    means the vocab-sized relation is touched exactly once (the groupBy
    building frequency classes), and the regression runs on the tiny
    class domain. Slope and intercept are fixed-shape IEEE expressions
    of the exact moments."""
    from .prefix import attach_prefix_sums

    tok = spark.table("documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    vocab = tok.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    cls = vocab.groupBy("c").agg(F.count("*").cast("long").alias("t"))
    cum = attach_prefix_sums(cls, ["c"], ["t"])
    tot = cls.agg(F.sum("t").cast("long").alias("tt"))
    gx = _round_ieee(
        F.log(
            (2 * (F.col("tt") - F.col("upto")) + F.col("t") + 1).cast("double")
            / 2.0
        ),
        6,
    ).cast("decimal(12,6)")
    gy = _round_ieee(F.log(F.col("c").cast("double")), 6).cast("decimal(12,6)")
    pts = (
        cum.withColumnRenamed("t_upto", "upto")
        .crossJoin(F.broadcast(tot))
        .select("t", gx.alias("gx"), gy.alias("gy"))
    )
    # Spark-side exactness (r10 ADVICE): a bare t * (gx*gy) is
    # long × decimal(25,12) → precision 46, which allowPrecisionLoss
    # rounds to decimal(38,6) PER TERM — off the 12-dp grid DuckDB sums
    # exactly. Casting t to decimal(17,0) and the grid product to
    # decimal(20,12) (|gx·gy| < 1000, so 8 integer digits suffice)
    # keeps every product at decimal(38,12) — exact on both engines.
    t17 = F.col("t").cast("decimal(17,0)")
    mom = pts.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(t17 * F.col("gx")).alias("sx"),
        F.sum(t17 * F.col("gy")).alias("sy"),
        F.sum(t17 * (F.col("gx") * F.col("gy")).cast("decimal(20,12)")).alias(
            "sxy"
        ),
        F.sum(t17 * (F.col("gx") * F.col("gx")).cast("decimal(20,12)")).alias(
            "sxx"
        ),
    )
    return mom.select(
        F.col("n").alias("n_terms"),
        _round_ieee(F.expr(_ZIPF_SLOPE), 6).alias("zipf_slope"),
        _round_ieee(F.expr(_ZIPF_ICEPT), 6).alias("zipf_intercept"),
    )


_BLM_TOP = 20


@query(
    "text_bigram_lm_perplexity",
    oracle=f"""
    WITH arrs AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents
    ), pairs AS (
      SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
      FROM arrs, LATERAL (SELECT unnest(range(1, len(arr))) AS i) s
    ), big AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pairs GROUP BY 1, 2
    ), firsts AS (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM big GROUP BY 1
    ), vv AS (
      SELECT CAST(count(DISTINCT unnest.w) AS BIGINT) AS v
      FROM (SELECT unnest(arr) AS w FROM arrs) AS unnest(w)
    ), lp AS (
      SELECT w1, w2,
             CAST({_sql_round_ieee(
                 "ln((CAST(c12 AS DOUBLE) + 0.5)"
                 "   / (CAST(c1 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)))", 6)}
                  * 1000000.0 AS DECIMAL(18,0)) AS micro
      FROM big JOIN firsts USING (w1) CROSS JOIN vv
    ), perdoc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             sum(micro) AS micros
      FROM pairs JOIN lp USING (w1, w2)
      GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams,
           {_sql_round_ieee(
               "-(CAST(micros AS DOUBLE) / 1000000.0)"
               " / CAST(n_bigrams AS DOUBLE)", 6)} AS xent
    FROM perdoc
    ORDER BY xent DESC, doc_id LIMIT {_BLM_TOP}
    """,
)
def text_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model surprise scoring: train add-½-smoothed
    conditional bigram probabilities P(w₂|w₁) on the corpus itself,
    score every document's mean negative log-probability (cross-entropy
    in nats per bigram), and surface the 20 most surprising documents —
    the classic KenLM-shaped perplexity filter for catching boilerplate
    and noise, one order up from the unigram text_lm_score.

    Scale shape: bigrams zip MAP-SIDE inside each doc's token array (no
    positional self-join); the LM is two corpus rollups (bigram counts,
    then first-word totals — derived from the bigram table, so the
    conditional denominators are consistent by construction). Scoring
    joins doc bigrams to the LM on (w₁,w₂) — one linear hash exchange.
    Per-bigram log-probs land on the 1e-6 grid as DECIMAL micros and
    per-doc sums are exact, so cross-engine agreement survives any
    aggregation order; the final per-doc division is one IEEE op.
    TakeOrdered bounds the output."""
    arrs = spark.table("documents").select(
        "doc_id", F.split("text", " ").alias("arr")
    )
    pairs = (
        arrs.filter(F.size("arr") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("arr") - 2),
                    lambda i: F.struct(
                        F.col("arr")[i].alias("w1"),
                        F.col("arr")[i + 1].alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    big = pairs.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
    firsts = big.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    vv = (
        arrs.select(F.explode("arr").alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    micro = (
        _round_ieee(
            F.log(
                (F.col("c12").cast("double") + 0.5)
                / (F.col("c1").cast("double") + 0.5 * F.col("v").cast("double"))
            ),
            6,
        )
        * 1000000.0
    ).cast("decimal(18,0)")
    lp = (
        big.join(firsts, "w1")
        .crossJoin(F.broadcast(vv))
        .select("w1", "w2", micro.alias("micro"))
    )
    perdoc = (
        pairs.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("micro").alias("micros"),
        )
    )
    return perdoc.select(
        "doc_id",
        "n_bigrams",
        _round_ieee(
            -(F.col("micros").cast("double") / 1000000.0)
            / F.col("n_bigrams").cast("double"),
            6,
        ).alias("xent"),
    ).orderBy(F.desc("xent"), "doc_id").limit(_BLM_TOP)


_HEAPS_SLOPE = (
    "((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)


@query(
    "text_heaps_law_fit",
    oracle=f"""
    WITH arrs AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents
    ), doctok AS (
      SELECT doc_id, CAST(len(arr) AS BIGINT) AS ntok FROM arrs
    ), firstseen AS (
      SELECT w, min(doc_id) AS fs FROM (
        SELECT doc_id, unnest(arr) AS w FROM arrs
      ) GROUP BY w
    ), mx AS (SELECT max(doc_id) AS mid FROM doctok),
    grid AS (
      SELECT k, CAST((SELECT mid FROM mx) * k // 10 AS BIGINT) AS cutoff
      FROM (SELECT unnest(range(1, 11)) AS k)
    ), pts AS (
      SELECT g.k,
             (SELECT CAST(sum(ntok) AS BIGINT) FROM doctok
              WHERE doc_id <= g.cutoff) AS tokens,
             (SELECT CAST(count(*) AS BIGINT) FROM firstseen
              WHERE fs <= g.cutoff) AS vocab
      FROM grid g
    ), gridded AS (
      -- tokens/vocab > 0 guard: an EMPTY corpus (r10 empty fixture)
      -- makes every correlated count 0 and ln(0) aborts DuckDB; on any
      -- non-empty corpus every decile point has tokens,vocab >= 1, so
      -- this is a no-op (Spark mirrors the filter for symmetry).
      SELECT k, tokens, vocab,
             CAST({_sql_round_ieee("ln(CAST(tokens AS DOUBLE))", 6)}
               AS DECIMAL(38,6)) AS gx,
             CAST({_sql_round_ieee("ln(CAST(vocab AS DOUBLE))", 6)}
               AS DECIMAL(38,6)) AS gy
      FROM pts
      WHERE tokens > 0 AND vocab > 0
    ), mom AS (
      SELECT CAST(count(*) AS BIGINT) AS np,
             sum(gx) AS sx, sum(gy) AS sy,
             sum(gx * gy) AS sxy, sum(gx * gx) AS sxx
      FROM gridded
    )
    SELECT k, tokens, vocab, {{b}} AS heaps_beta
    FROM gridded CROSS JOIN mom ORDER BY k
    """.format(b=_sql_round_ieee(_HEAPS_SLOPE, 6)),
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit — vocabulary growth V(n) ≈ K·n^β along the corpus
    (β ≈ 0.4–0.6 for natural text; a templated corpus flatlines) — the
    growth-side companion of text_zipf_fit's frequency-side law.

    The trick that makes cumulative-distinct DISTRIBUTABLE: V(cutoff)
    needs "distinct words among docs ≤ cutoff", which is NOT a
    decomposable aggregate — but each word's FIRST-SEEN doc_id is, so
    one groupBy(word).min(doc_id) turns every cumulative vocabulary
    count into a simple filter-count over the word catalog. One corpus
    pass total; the 10-point decile grid broadcasts; the log-log OLS
    runs on 10 grid-rounded points with exact decimal moments."""
    from .prefix import attach_prefix_sums  # noqa: F401  (family marker)

    arrs = spark.table("documents").select(
        "doc_id", F.split("text", " ").alias("arr")
    )
    doctok = arrs.select("doc_id", F.size("arr").cast("long").alias("ntok"))
    firstseen = (
        arrs.select("doc_id", F.explode("arr").alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("fs"))
    )
    mx = doctok.agg(F.max("doc_id").alias("mid"))
    grid = (
        spark.range(1, 11)
        .select(F.col("id").cast("long").alias("k"))
        .crossJoin(F.broadcast(mx))
        .select("k", F.expr("mid * k div 10").alias("cutoff"))
    )
    toks = (
        doctok.crossJoin(F.broadcast(grid))
        .filter(F.col("doc_id") <= F.col("cutoff"))
        .groupBy("k")
        .agg(F.sum("ntok").cast("long").alias("tokens"))
    )
    vocab = (
        firstseen.crossJoin(F.broadcast(grid))
        .filter(F.col("fs") <= F.col("cutoff"))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("vocab"))
    )
    pts = toks.join(vocab, "k").filter(
        (F.col("tokens") > 0) & (F.col("vocab") > 0)
    )
    gx = _round_ieee(F.log(F.col("tokens").cast("double")), 6).cast("decimal(38,6)")
    gy = _round_ieee(F.log(F.col("vocab").cast("double")), 6).cast("decimal(38,6)")
    gridded = pts.select("k", "tokens", "vocab", gx.alias("gx"), gy.alias("gy"))
    mom = gridded.agg(
        F.count("*").cast("long").alias("np"),
        F.sum("gx").alias("sx"),
        F.sum("gy").alias("sy"),
        F.sum(F.col("gx") * F.col("gy")).alias("sxy"),
        F.sum(F.col("gx") * F.col("gx")).alias("sxx"),
    )
    return (
        gridded.crossJoin(F.broadcast(mom))
        .select(
            "k", "tokens", "vocab",
            _round_ieee(F.expr(_HEAPS_SLOPE), 6).alias("heaps_beta"),
        )
        .orderBy("k")
    )


@query(
    "text_pii_redact",
    oracle=f"""
    WITH red AS (
      SELECT doc_id, source, text,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_IPV4_RE}', '<IP>', 'g'),
                 '{_LONG_DIGITS_RE}', '<NUM>', 'g'),
               '{_DENYLIST_RE}', '<TERM>', 'g') AS redacted
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE redacted <> text) AS BIGINT)
             AS n_docs_redacted,
           CAST(sum(len(text) - len(redacted)
                    + 7 * len(regexp_extract_all(text, '{_EMAIL_RE}'))
                    + 4 * len(regexp_extract_all(text, '{_IPV4_RE}'))
                    + 5 * len(regexp_extract_all(text, '{_LONG_DIGITS_RE}'))
                    + 6 * len(regexp_extract_all(text, '{_DENYLIST_RE}')))
               AS BIGINT) AS n_chars_removed,
           CAST(sum(len(redacted)) AS BIGINT) AS chars_after
    FROM red GROUP BY source ORDER BY source
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII REDACTION — the action after text_pii_scan's detection:
    emails → <EMAIL>, IPv4 → <IP>, long digit runs → <NUM>, deny-list
    terms → <TERM>, reported as
    the per-source redaction ledger (docs touched, original characters
    removed, corpus size after). Patterns stay inside the RE2 ∩ Java
    common dialect (no lookarounds), so both engines rewrite the same
    spans; the chars-removed accounting adds back the placeholder
    lengths so it counts ORIGINAL text excised, not net length drift.

    Scale shape: three chained JVM-side regexp_replace passes — map-
    only, whole-stage-codegen, pipelines with the scan — plus one
    source-bounded rollup. The synthetic corpus has no real PII (the
    scan op documents this), so the DENY-LIST class — which the corpus
    does contain — keeps the rewrite path NON-VACUOUS (the join_anti
    0-vs-0 lesson applied at birth): the ledger reports real
    replacements while the email/IP/digit classes pin the shape."""
    d = spark.table("documents")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
                _IPV4_RE,
                "<IP>",
            ),
            _LONG_DIGITS_RE,
            "<NUM>",
        ),
        _DENYLIST_RE,
        "<TERM>",
    )
    red = d.select("doc_id", "source", "text", redacted.alias("redacted"))
    removed = (
        F.length("text")
        - F.length("redacted")
        + 7 * F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), 0))
        + 4 * F.size(F.regexp_extract_all(F.col("text"), F.lit(_IPV4_RE), 0))
        + 5
        * F.size(F.regexp_extract_all(F.col("text"), F.lit(_LONG_DIGITS_RE), 0))
        + 6
        * F.size(F.regexp_extract_all(F.col("text"), F.lit(_DENYLIST_RE), 0))
    )
    return (
        red.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count(F.when(F.col("redacted") != F.col("text"), 1))
            .cast("long")
            .alias("n_docs_redacted"),
            F.sum(removed).cast("long").alias("n_chars_removed"),
            F.sum(F.length("redacted")).cast("long").alias("chars_after"),
        )
        .orderBy("source")
    )


#: Interpolated Kneser-Ney with absolute discount D = 0.75 (exact in
#: binary: 3/4). All five model quantities come from the bigram table:
#: c12, c1 = Σ_w2 c12, nf(w1) = |{w2 : c12>0}|, nb(w2) = |{w1 : c12>0}|,
#: B = total distinct bigram types. One shared IEEE expression per
#: bigram, rounded onto the 1e-6 grid BEFORE the per-doc decimal sum.
_KN_LOGP = (
    "ln((CASE WHEN CAST(c12 AS DOUBLE) - 0.75 > 0.0"
    "         THEN CAST(c12 AS DOUBLE) - 0.75 ELSE 0.0 END)"
    "    / CAST(c1 AS DOUBLE)"
    "    + (0.75 * CAST(nf AS DOUBLE) / CAST(c1 AS DOUBLE))"
    "      * (CAST(nb AS DOUBLE) / CAST(b AS DOUBLE)))"
)


@query(
    "text_kneser_ney_perplexity",
    oracle=f"""
    WITH arrs AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents
    ), pairs AS (
      SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
      FROM arrs, LATERAL (SELECT unnest(range(1, len(arr))) AS i) s
    ), big AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pairs GROUP BY 1, 2
    ), firsts AS (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS nf
      FROM big GROUP BY 1
    ), conts AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS nb FROM big GROUP BY 1
    ), bb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM big),
    lp AS (
      SELECT w1, w2,
             CAST({_sql_round_ieee(_KN_LOGP, 6)} * 1000000.0
                  AS DECIMAL(18,0)) AS micro
      FROM big JOIN firsts USING (w1) JOIN conts USING (w2) CROSS JOIN bb
    ), perdoc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             sum(micro) AS micros
      FROM pairs JOIN lp USING (w1, w2)
      GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams,
           {_sql_round_ieee(
               "-(CAST(micros AS DOUBLE) / 1000000.0)"
               " / CAST(n_bigrams AS DOUBLE)", 6)} AS xent
    FROM perdoc
    ORDER BY xent DESC, doc_id LIMIT {_BLM_TOP}
    """,
)
def text_kneser_ney_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (absolute discount
    D = 0.75): P(w₂|w₁) = max(c₁₂−D,0)/c₁ + D·N₁₊(w₁,·)/c₁ ·
    N₁₊(·,w₂)/B — the production-standard smoothing
    (text_bigram_lm_perplexity's add-½ over-penalizes frequent-but-
    narrow histories; KN backs off to CONTINUATION counts, the "how
    many contexts has w₂ ever followed" signal that makes it the KenLM
    default). Same surprise-ranking output: top-20 highest
    cross-entropy docs.

    Exactness: D = 3/4 is exact in binary; the five model counts are
    integers; each bigram's log-prob is ONE shared IEEE expression
    rounded onto the 1e-6 grid before the per-doc DECIMAL sum
    (order-free). Scale shape: bigrams zip map-side in the token
    array; the LM is three rollups OF THE BIGRAM TABLE (first-word
    totals+fanouts, continuation fanins, one type-count scalar) — no
    extra corpus pass vs add-½; scoring is the same single
    (w₁,w₂)-keyed hash join."""
    arrs = spark.table("documents").select(
        "doc_id", F.split("text", " ").alias("arr")
    )
    pairs = (
        arrs.filter(F.size("arr") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("arr") - 2),
                    lambda i: F.struct(
                        F.col("arr")[i].alias("w1"),
                        F.col("arr")[i + 1].alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    big = pairs.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c12")
    ).localCheckpoint(eager=False)  # LM base relation: consumed by 4 rollups + join
    firsts = big.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("nf"),
    )
    conts = big.groupBy("w2").agg(F.count("*").cast("long").alias("nb"))
    bb = big.agg(F.count("*").cast("long").alias("b"))
    micro = (
        _round_ieee(F.expr(_KN_LOGP), 6) * 1000000.0
    ).cast("decimal(18,0)")
    lp = (
        big.join(firsts, "w1")
        .join(conts, "w2")
        .crossJoin(F.broadcast(bb))
        .select("w1", "w2", micro.alias("micro"))
    )
    perdoc = (
        pairs.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("micro").alias("micros"),
        )
    )
    return (
        perdoc.select(
            "doc_id",
            "n_bigrams",
            _round_ieee(
                -(F.col("micros").cast("double") / 1000000.0)
                / F.col("n_bigrams").cast("double"),
                6,
            ).alias("xent"),
        )
        .orderBy(F.desc("xent"), "doc_id")
        .limit(_BLM_TOP)
    )


# ---------------------------------------------------------------------------
# end-to-end corpus curation: filter → dedup → near-dedup → split
# ---------------------------------------------------------------------------


@query(
    "pipeline_corpus_curation_e2e",
    oracle="""
    WITH base AS (
      SELECT doc_id, source, n_chars, text,
             len(string_split(text, ' ')) AS ntok
      FROM documents
    ), filtered AS (
      SELECT * FROM base
      WHERE n_chars BETWEEN 100 AND 520 AND ntok >= 20
    ), exact AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY sha256(text)
                                     ORDER BY doc_id) AS rn
        FROM filtered
      ) WHERE rn = 1
    ), near AS (
      SELECT * FROM (
        SELECT doc_id, source, n_chars, ntok,
               row_number() OVER (
                 PARTITION BY array_to_string(string_split(text, ' ')[1:5], ' ')
                 ORDER BY doc_id) AS rn2
        FROM exact
      ) WHERE rn2 = 1
    ), split_ AS (
      SELECT source, n_chars, ntok,
             CASE WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 4) < '7fff'
                  THEN 'train' ELSE 'valid' END AS split
      FROM near
    )
    SELECT split, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS total_tokens,
           round(avg(n_chars), 6) AS avg_chars
    FROM split_ GROUP BY split, source
    """,
)
def pipeline_corpus_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as one composed plan — quality filter
    (length + token-count gates) → exact dedup (keep-first per
    sha256(text)) → prefix-fingerprint near-dedup (keep-first per
    first-5-token fingerprint) → leak-free hash split → per-(split,
    source) corpus card. Every stage exists as a standalone operator
    (filter_c4_style, dedup_keep_first, dedup_near_dup_clusters,
    sample_train_valid_split, docs_dataset_card); this proves they
    COMPOSE into one Catalyst plan with correct end-to-end semantics —
    the actual shape a training-data job ships, where the value check
    must survive four stages of survivorship interacting.

    Scale shape: the filter prunes before anything shuffles; each dedup
    stage is ONE hash exchange on its fingerprint with a PARTITIONED
    keep-first window (survivor rows only flow forward); the split is
    a map-side hash; the card is one bounded rollup. Nothing in the
    chain re-scans the corpus — four stages, three exchanges, one scan."""
    base = spark.table("documents").select(
        "doc_id",
        "source",
        "n_chars",
        "text",
        F.size(F.split("text", " ")).alias("ntok"),
    )
    filtered = base.where(
        (F.col("n_chars") >= 100) & (F.col("n_chars") <= 520) & (F.col("ntok") >= 20)
    )
    w1 = W.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    exact = filtered.withColumn("rn", F.row_number().over(w1)).where(
        F.col("rn") == 1
    )
    fp = F.array_join(F.slice(F.split("text", " "), 1, 5), " ")
    w2 = W.partitionBy(fp).orderBy("doc_id")
    near = exact.withColumn("rn2", F.row_number().over(w2)).where(
        F.col("rn2") == 1
    )
    split = F.when(
        F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 4) < "7fff",
        F.lit("train"),
    ).otherwise(F.lit("valid"))
    return (
        near.select(split.alias("split"), "source", "n_chars", "ntok")
        .groupBy("split", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("total_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# end-to-end feature-store job: leakage-safe features + label + split
# ---------------------------------------------------------------------------

_FS_LABEL_WINDOW_S = 7 * 86400


@query(
    "pipeline_feature_store_e2e",
    oracle=f"""
    WITH sec AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ), cut AS (
      SELECT max(ts_s) - {_FS_LABEL_WINDOW_S} AS cutoff_s FROM sec
    ), feats AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT d) AS BIGINT) AS n_active_days,
             CAST(max(ts_s) AS BIGINT) AS last_s,
             CAST(coalesce(sum(cents) FILTER (WHERE event_type = 'purchase'),
                           0) AS BIGINT) AS purch_cents
      FROM sec CROSS JOIN cut WHERE ts_s <= cutoff_s
      GROUP BY user_id
    ), labels AS (
      SELECT DISTINCT user_id FROM sec CROSS JOIN cut
      WHERE ts_s > cutoff_s AND event_type = 'purchase'
    ), joined AS (
      SELECT f.user_id, f.n_events, f.n_active_days,
             (SELECT cutoff_s FROM cut) - f.last_s AS recency_s,
             f.purch_cents,
             (l.user_id IS NOT NULL) AS label,
             CASE WHEN substr(sha256(CAST(f.user_id AS VARCHAR)), 1, 4)
                       < '7fff'
                  THEN 'train' ELSE 'valid' END AS split
      FROM feats f LEFT JOIN labels l USING (user_id)
    )
    SELECT split, label,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(n_events) AS DOUBLE) / count(*), 6) AS avg_events,
           round(CAST(sum(n_active_days) AS DOUBLE) / count(*), 6)
             AS avg_active_days,
           round(CAST(sum(recency_s) AS DOUBLE) / count(*), 6)
             AS avg_recency_s,
           CAST(sum(purch_cents) AS DOUBLE) / 100.0 AS total_purchases
    FROM joined GROUP BY split, label
    """,
)
def pipeline_feature_store_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-store job END-TO-END with the leakage discipline
    that makes or breaks offline training: a point-in-time CUTOFF
    (last timestamp − 7 days), per-user features computed ONLY from
    events at-or-before it (activity count, distinct active days,
    recency in exact integer seconds, purchase total in exact cents),
    the label ONLY from the 7-day window after it (future purchase),
    and the leak-free hash split — emitted as the per-(split, label)
    cohort card a training run logs before fitting anything. Composes
    join_scd2_pointintime's as-of discipline, events_rfm_segments'
    feature shapes, and sample_train_valid_split's hash split into the
    one job every events→model pipeline actually is; a feature that
    peeked past the cutoff or a label that leaked backward shifts the
    cohort card, so the cross-engine value match checks the temporal
    hygiene itself.

    Scale shape: ONE fact pass builds features (map-side-combinable
    per-user aggregate), one semi-side pass builds labels, one
    user-keyed join, one bounded rollup; the cutoff is a 1-row
    broadcast; all boundary comparisons are integer-second — split
    membership and windows can't flip on a float ulp."""
    sec = spark.table("events").select(
        "user_id",
        "event_type",
        F.floor(F.col("ts").cast("timestamp").cast("double"))
        .cast("long")
        .alias("ts_s"),
        F.expr(
            "CAST(floor(CAST(CAST(ts AS TIMESTAMP) AS DOUBLE)) AS BIGINT)"
            " div 86400"
        ).alias("d"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    cut = sec.agg(
        (F.max("ts_s") - _FS_LABEL_WINDOW_S).cast("long").alias("cutoff_s")
    )
    withcut = sec.crossJoin(F.broadcast(cut))
    feats = (
        withcut.where(F.col("ts_s") <= F.col("cutoff_s"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("d").cast("long").alias("n_active_days"),
            F.max("ts_s").cast("long").alias("last_s"),
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("cents"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("purch_cents"),
            F.max("cutoff_s").alias("cutoff_s"),
        )
    )
    labels = (
        withcut.where(
            (F.col("ts_s") > F.col("cutoff_s"))
            & (F.col("event_type") == "purchase")
        )
        .select("user_id")
        .distinct()
        .withColumn("lbl", F.lit(True))
    )
    split = F.when(
        F.substring(F.sha2(F.col("user_id").cast("string"), 256), 1, 4) < "7fff",
        F.lit("train"),
    ).otherwise(F.lit("valid"))
    joined = feats.join(labels, "user_id", "left").select(
        split.alias("split"),
        F.coalesce("lbl", F.lit(False)).alias("label"),
        "n_events",
        "n_active_days",
        (F.col("cutoff_s") - F.col("last_s")).alias("recency_s"),
        "purch_cents",
    )
    return joined.groupBy("split", "label").agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(
            F.sum("n_events").cast("double") / F.count("*"), 6
        ).alias("avg_events"),
        F.round(
            F.sum("n_active_days").cast("double") / F.count("*"), 6
        ).alias("avg_active_days"),
        F.round(
            F.sum("recency_s").cast("double") / F.count("*"), 6
        ).alias("avg_recency_s"),
        (F.sum("purch_cents").cast("double") / 100.0).alias("total_purchases"),
    )
