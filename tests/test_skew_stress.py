"""Adversarial hot-key stress for the dedup pair generators.

Both `dedup_substring_exact` and `dedup_semantic_clusters` concentrate
hot keys — a mass-duplicated k-token span hashes every copy to ONE
digest (one window partition), and mass-duplicated embeddings pile into
one label. These tests pin the two documented claims:

- substring dedup: a 10⁴-duplicate digest is sort volume inside one
  window partition, not a blowup — results stay exact (dedup.py:381
  docstring's "sort volume, not blowup");
- semantic dedup: the occupancy-bounded blocking splits a 10⁴-vector
  label into ~CELL_OCCUPANCY-sized sub-cells, so pair work is
  Σ C(cell, 2) ≈ linear in the corpus, never C(10⁴, 2) (vectors.py
  CELL_OCCUPANCY contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

N_DOCS = 10_000


def test_substring_dedup_hot_digest_exact(spark):
    """10⁴ documents all sharing one 8-token span: the span's digest
    carries 10⁴ rows in a single window partition. The window-min firsts
    must stream through it and still produce exact counts: the earliest
    doc owns the span, every other doc has exactly one duplicate span."""
    from shelf_spark.queries.dedup import SUBSTR_K, substring_dup_stats

    span = " ".join(f"s{j}" for j in range(SUBSTR_K))
    docs = spark.createDataFrame(
        [(i, f"a{i} b{i} {span}") for i in range(N_DOCS)],
        "doc_id bigint, text string",
    )
    out = substring_dup_stats(docs).collect()
    assert len(out) == N_DOCS
    for r in out:
        # 10 tokens → 3 windows; only the pure-span window is shared
        assert r.n_windows == 3
        assert r.n_dup_windows == (0 if r.doc_id == 0 else 1)
        assert r.has_dup_span == (r.doc_id > 0)


def test_semantic_blocking_caps_pair_volume_under_mass_duplication(spark):
    """10⁴ identical vectors in one label: without occupancy blocking the
    pair join would emit C(10⁴, 2) ≈ 5·10⁷ pairs; with it, pair volume is
    Σ C(cell, 2) over ~40 hash-balanced sub-cells — and the clusters are
    exactly the sub-cells (the recall/cost trade the docstring states)."""
    from shelf_spark.queries.sampling import star_components
    from shelf_spark.queries.vectors import (
        CELL_OCCUPANCY,
        occupancy_blocked,
        semantic_pairs,
    )

    v = occupancy_blocked(
        spark.createDataFrame(
            [(i, 7, [1.0, 2.0, 3.0, 4.0], 30.0**0.5) for i in range(N_DOCS)],
            "vec_id bigint, label int, vec array<double>, nrm double",
        )
    ).localCheckpoint()  # one blocking pass feeds cells, pairs, clusters

    cells = {r.sub: r.cnt for r in v.groupBy("sub").agg(F.count("*").alias("cnt")).collect()}
    assert len(cells) == -(-N_DOCS // CELL_OCCUPANCY)  # ceil: 40 sub-cells
    # content-hash balance: no cell more than 2× the occupancy target
    assert max(cells.values()) <= 2 * CELL_OCCUPANCY

    pairs = semantic_pairs(v, 0.9)
    expect_pairs = sum(c * (c - 1) // 2 for c in cells.values())
    assert pairs.count() == expect_pairs  # ≈ 1.2M, not 5·10⁷

    comp_sizes = sorted(
        r.n
        for r in star_components(pairs, "va", "vb")
        .groupBy("component")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert comp_sizes == sorted(cells.values())  # one clique per sub-cell


def test_chunk_dedup_hot_digest_matches_python_oracle(spark):
    """10⁴ documents sharing a long tail span: content-defined boundaries
    resync inside the shared span, so its chunks become one mass-hot
    digest each. Expected counts are recomputed INDEPENDENTLY in pure
    Python (hashlib — same sha256 the JVM computes), so this pins the
    whole chunker + window-min firsts under hot-key skew."""
    import hashlib

    from shelf_spark.queries.retrieval import CDC_MOD, CDC_W, cdc_chunks

    shared = " ".join(f"w{j % 7}x{j % 11}" for j in range(40))
    docs = [(i, f"u{i}a u{i}b {shared}") for i in range(N_DOCS)]

    def py_chunks(text):
        toks = text.split(" ")
        n = len(toks)
        bounds = [
            i
            for i in range(CDC_W, n)
            if int(
                hashlib.sha256(" ".join(toks[i - CDC_W:i]).encode()).hexdigest()[:4],
                16,
            )
            % CDC_MOD
            == 0
        ] if n > CDC_W else []
        starts = [1] + [b + 1 for b in bounds]
        ends = bounds + [n]
        return [
            hashlib.sha256(" ".join(toks[s - 1:e]).encode()).hexdigest()[:16]
            for s, e in zip(starts, ends)
        ]

    firsts: dict[str, int] = {}
    per_doc: dict[int, list[str]] = {}
    for doc_id, text in docs:
        ch = py_chunks(text)
        per_doc[doc_id] = ch
        for d in ch:
            firsts.setdefault(d, doc_id)
    want = {
        doc_id: (
            len(ch),
            sum(1 for d in ch if firsts[d] < doc_id),
        )
        for doc_id, ch in per_doc.items()
    }
    # sanity on the fixture itself: the shared span yields ≥1 hot digest
    # carried by (nearly) every doc
    hot = max(
        sum(1 for ch in per_doc.values() if d in ch) for d in firsts
    )
    assert hot > N_DOCS * 0.9

    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    chunks = cdc_chunks(sdf).select("doc_id", "chunk_digest")
    from pyspark.sql import Window

    first = F.min("doc_id").over(Window.partitionBy("chunk_digest"))
    got = {
        r.doc_id: (r.n, r.dup)
        for r in chunks.select("doc_id", first.alias("fd"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("fd") < F.col("doc_id"), 1)).alias("dup"),
        )
        .collect()
    }
    assert got == want


def test_inverted_index_hot_term_postings_capped_and_exact(spark):
    """10⁴ documents all containing one stop-word-like term (twice each):
    the term's window partition carries 10⁴ rows, but the posting collect
    must hold only the cap — and df/cf/postings must match a pure-Python
    oracle exactly (df = corpus size, cf = 2·corpus, postings = the
    lowest doc ids)."""
    from shelf_spark.queries.retrieval import _POSTINGS_CAP, inverted_index

    docs = spark.createDataFrame(
        [(i, f"the u{i} the") for i in range(N_DOCS)],
        "doc_id bigint, text string",
    )
    rows = {r.term: r for r in inverted_index(docs).collect()}
    hot = rows["the"]
    assert hot.df == N_DOCS
    assert hot.cf == 2 * N_DOCS
    assert hot.postings == ",".join(str(i) for i in range(_POSTINGS_CAP))
    # every singleton term: df=1, cf=1, its own doc as the only posting
    assert rows["u17"].df == 1 and rows["u17"].postings == "17"
    assert len(rows) == N_DOCS + 1


def test_pareto_frontier_matches_bruteforce_dominance(spark):
    """The compressed-domain skyline must equal the O(n²) dominance
    definition on an adversarial set: duplicate (size, price) points
    (neither dominates), equal-price-different-size chains, and a
    strictly-dominated diagonal."""
    import itertools
    import random

    from shelf_spark.queries.stats import pareto_frontier

    rng = random.Random(7)
    pts = [(i, rng.randrange(1, 12), rng.randrange(1, 15) * 1.0)
           for i in range(300)]
    pts += [(1000, 5, 7.0), (1001, 5, 7.0)]  # exact ties survive together
    df = spark.createDataFrame(
        pts, "p_partkey bigint, p_size int, p_retailprice double"
    )
    got = {r.p_partkey for r in pareto_frontier(df).collect()}
    dominated = set()
    for (i, si, pi), (j, sj, pj) in itertools.permutations(pts, 2):
        if sj >= si and pj <= pi and (sj > si or pj < pi):
            dominated.add(i)
    want = {i for i, _, _ in pts} - dominated
    assert got == want
