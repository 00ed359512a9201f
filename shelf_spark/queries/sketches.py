"""Sketch-based aggregation operators: exact heavy hitters via a
two-pass Misra–Gries candidate sweep, and mergeable HyperLogLog rollups.

These are the approximate/streaming-adjacent aggregates a 100 TB corpus
pipeline needs where a plain groupBy over the raw key domain is the
bottleneck (token vocabularies, user-id cardinalities per cell):

- ``agg_heavy_hitters`` finds every token whose global frequency exceeds
  N/K **exactly**, without ever shuffling the full token→count table:
  pass 1 runs Misra–Gries summaries per partition (bounded state, one
  Arrow-batched scan, no shuffle), pass 2 exact-recounts only the
  candidate set. By the MG guarantee (each counter undercounts by at
  most n_p/(k+1) within its partition) plus pigeonhole across
  partitions, any token with global count > N/K for K ≤ k+1 survives in
  at least one partition's summary — so the candidate set provably
  contains all true heavy hitters and the exact second pass makes the
  output value-identical to the brute-force groupBy the DuckDB oracle
  runs. This is the classical distributed top-k shape: sketch where the
  domain is huge, verify exactly where the candidate set is tiny.
- ``rollup_hll_mergeable`` materializes per-day HLL sketches of the
  user-id set (Datasketches binary blobs, `hll_sketch_agg`), then
  re-aggregates the *sketches* (`hll_union_agg`) for the month total —
  the mergeable-rollup contract: any coarser grain is derived from
  stored fine-grain sketches without touching raw data again. Estimates
  are engine-specific → rows-only driver check; a pytest pins the
  estimates within tolerance of the exact distinct counts.

Reference parity: shelf delegates aggregation to DuckDB SQL steps
(reference src/shelf/tables.py:155-181); DuckDB's approx_count_distinct
is the same HLL idea but its sketches aren't user-mergeable across
steps — persisting mergeable sketch columns is the Spark-first upgrade.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .num import sane_ts, sql_sane_ts
from .registry import query

#: Heavy-hitter threshold: report tokens with count > N / _HH_K.
_HH_K = 30
#: Misra–Gries counters per partition; k+1 ≥ _HH_K is required for the
#: no-false-negative guarantee, 127 gives a wide margin (state stays
#: trivially bounded: 127 (token, count) pairs per partition).
_MG_COUNTERS = 127


def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Misra–Gries summary of one partition's token stream.

    Batch-merge variant: fold each Arrow batch's value_counts into the
    counter table, then trim back to _MG_COUNTERS by subtracting the
    (k+1)-th largest count from everyone and dropping the non-positive —
    each subtracted unit is matched by a simultaneous subtraction on ≥ k
    other counters, so any token's total undercount is ≤ n_p/(k+1)."""
    counters: Counter[str] = Counter()
    for pdf in batches:
        counters.update(Counter(pdf["token"].value_counts().to_dict()))
        if len(counters) > _MG_COUNTERS:
            vals = sorted(counters.values(), reverse=True)
            cut = vals[_MG_COUNTERS]
            counters = Counter(
                {t: c - cut for t, c in counters.items() if c > cut}
            )
    yield pd.DataFrame({"token": list(counters.keys())})


@query(
    "agg_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM toks)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM toks
    GROUP BY token
    HAVING count(*) * {_HH_K} > (SELECT n FROM tot)
    ORDER BY cnt DESC, token
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tokens with frequency > N/{K}: Misra–Gries per-partition
    candidates (map-only, bounded state), broadcast-semi-join filter,
    then an exact recount of candidates only. See module docstring for
    the completeness proof."""
    toks = spark.table("documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    candidates = (
        toks.mapInPandas(_mg_candidates, "token string").distinct()
    )
    # Candidate set is ≤ 127 × partitions rows — constant-bounded, safe
    # to broadcast-hint regardless of SF (unlike data-proportional dims).
    counted = (
        toks.join(F.broadcast(candidates), "token", "leftsemi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    total = toks.agg(F.count("*").alias("n"))
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * _HH_K > F.col("n"))
        .select("token", "cnt")
        .orderBy(F.desc("cnt"), "token")
    )


agg_heavy_hitters.__doc__ = agg_heavy_hitters.__doc__.format(K=_HH_K)


def _hll_within_tol(est: F.Column, exact: F.Column) -> F.Column:
    """ε-bound assertion for an HLL estimate vs the exact distinct count:
    within 10% (≫5σ at the default lgConfigK=12, rsd≈1.6%; exact-mode
    below the sparse threshold) with an absolute grace of 2 for tiny
    groups. A null estimate (merge over zero sketches) satisfies the
    contract only when the exact count is 0."""
    return F.when(est.isNull(), exact == 0).otherwise(
        F.abs(est - exact) <= F.greatest(F.lit(0.10) * exact, F.lit(2.0))
    )


@query(
    "rollup_hll_mergeable",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events WHERE {sql_sane_ts('ts')}
    )
    SELECT CAST(day AS VARCHAR) AS grain,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_within_tol
    FROM ev GROUP BY day
    UNION ALL
    SELECT 'ALL', CAST(count(DISTINCT user_id) AS BIGINT), TRUE FROM ev
    ORDER BY grain
    """,
)
def rollup_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct-user estimates from stored HLL sketches, plus an
    'ALL' row whose estimate comes from MERGING the daily sketches —
    never re-scanning raw events. The persist-sketches-merge-later
    contract is what makes 100 TB rollup hierarchies cheap: day→month→
    year each aggregates ~365 small binary blobs, not 10^12 raw rows.

    ε-BOUNDED oracle (r11, VERDICT r10 ask #5): Spark's DataSketches HLL
    and DuckDB's HLL estimate differently by design, so the raw
    estimates stay Spark-side — the query emits the exact per-grain
    count plus a within-tolerance assertion on each estimate (the ALL
    row's assertion checks the UNION-MERGED sketch against the exact
    overall distinct, pinning mergeability itself), and the oracle
    recomputes the exact counts and pins the assertions TRUE. The
    event-time sanity window matches the engine-limit convention of the
    other per-day event rollups (r10 time corpus).

    Plan shape (r12, VERDICT r11 ask #5): the r11 version put
    ``count_distinct`` in the SAME ``.agg()`` as ``hll_sketch_agg``,
    so Catalyst's distinct rewrite keyed the first aggregation by
    (day, user_id) with the HLL sketch buffers riding the distinct-key
    exchange. The exact-verification arm is now a separate
    dedupe-then-count pass — ``(day, user_id).distinct()`` is a pure
    hash dedupe with NO aggregate state (map-side combinable), the
    per-day count over it is trivial — left-joined onto the sketch arm
    (a day whose user_ids are all null stays present with exact 0 and
    a null estimate, which the tolerance treats as satisfied-iff-0)."""
    keyed = (
        spark.table("events")
        .filter(sane_ts(F.col("ts")))
        .select(F.date_trunc("day", "ts").cast("date").alias("day"), "user_id")
    )
    # arm (a): sketches only — constant-size state, no distinct rewrite
    daily_sk = keyed.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    # arm (b): exact counts via explicit dedupe-then-count (count_distinct
    # ignores nulls; mirror that before the dedupe)
    pairs = keyed.filter(F.col("user_id").isNotNull()).distinct()
    daily_ex = pairs.groupBy("day").agg(
        F.count("*").cast("bigint").alias("exact_users")
    )
    daily_j = daily_sk.join(daily_ex, "day", "left").withColumn(
        "exact_users", F.coalesce(F.col("exact_users"), F.lit(0).cast("bigint"))
    )
    daily = daily_j.select(
        F.col("day").cast("string").alias("grain"),
        "exact_users",
        _hll_within_tol(
            F.hll_sketch_estimate("sk"), F.col("exact_users")
        ).alias("est_within_tol"),
    )
    merged = (
        daily_sk.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
        )
        .crossJoin(
            pairs.select("user_id")
            .distinct()
            .agg(F.count("*").cast("bigint").alias("exact_users"))
        )
        .select(
            F.lit("ALL").alias("grain"),
            "exact_users",
            _hll_within_tol(
                F.col("est_users"), F.col("exact_users")
            ).alias("est_within_tol"),
        )
    )
    return daily.unionByName(merged).orderBy("grain")


# ---------------------------------------------------------------------------
# r8e: Count-Min sketch (mergeable frequency estimates, value-exact)
# ---------------------------------------------------------------------------

_CMS_D = 4     #: hash rows
_CMS_W = 256   #: buckets per row (error bound e·N/w per row, min over d)
_CMS_TOP = 10  #: report the top-N true-heaviest parts

#: Cross-engine bucket hash: ONE sha256 per key, row j reading hex
#: chars [2j+1, 2j+2] of the digest → four independent 8-bit bucket
#: hashes from a single hash evaluation (standard strong-hash slicing;
#: an early draft hashed once per (key, j) and spent 4× the CPU for
#: identical statistics). Spark `conv`, DuckDB strpos-compose — the
#: same digit trick as sample_importance_dsir.
_CMS_DUCK_BUCKET = (
    "((strpos('0123456789abcdef', substr(h, 2 * j + 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(h, 2 * j + 2, 1)) - 1)"
)


@query(
    "rollup_cms_frequencies",
    oracle=f"""
    WITH keyed AS (
      SELECT l_partkey AS key, year(l_shipdate) AS part_year FROM lineitem
    ), cells AS (
      SELECT part_year, j,
             {_CMS_DUCK_BUCKET} AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM (SELECT part_year, j, sha256(CAST(key AS VARCHAR)) AS h
            FROM keyed CROSS JOIN generate_series(0, {_CMS_D - 1}) AS g(j)) t
      GROUP BY 1, 2, 3
    ), merged AS (
      SELECT j, bucket, CAST(sum(c) AS BIGINT) AS c
      FROM cells GROUP BY 1, 2
    ), tops AS (
      SELECT key, CAST(count(*) AS BIGINT) AS true_cnt
      FROM keyed GROUP BY key
      ORDER BY true_cnt DESC, key LIMIT {_CMS_TOP}
    ), est AS (
      SELECT t.key, t.true_cnt, min(m.c) AS est_cnt
      FROM (SELECT key, true_cnt, j,
                   {_CMS_DUCK_BUCKET} AS bucket
            FROM (SELECT key, true_cnt, j,
                         sha256(CAST(key AS VARCHAR)) AS h
                  FROM tops
                  CROSS JOIN generate_series(0, {_CMS_D - 1}) AS g(j)) q) t
      JOIN merged m ON m.j = t.j AND m.bucket = t.bucket
      GROUP BY 1, 2
    )
    SELECT key AS l_partkey, true_cnt, est_cnt,
           (est_cnt >= true_cnt) AS never_undercounts
    FROM est ORDER BY true_cnt DESC, l_partkey
    """,
)
def rollup_cms_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch [Cormode & Muthukrishnan, J.Alg'05] over
    lineitem part frequencies, built MERGEABLE: one d={_CMS_D}×w={_CMS_W}
    integer grid per ship-year, cell-wise-summed into the all-time
    sketch (the rollup contract: coarser grains derive from stored
    fine-grain sketches without rescanning facts — the frequency-domain
    sibling of `rollup_hll_mergeable`, but VALUE-exact because the hash
    grid is sha256-derived identically on both engines). The top-{_CMS_TOP}
    true-heaviest parts are then point-queried (min over the d cells) and
    emitted with their true counts and the CMS one-sided-error witness
    (`never_undercounts` — true by construction, checked, not asserted).

    100 TB shape: sketch state is d·w = 1,024 cells per grain REGARDLESS
    of key cardinality — the build is one map-side-combined agg whose
    shuffle carries cells, not keys; the merge is cell-wise addition
    (associative, any tree shape); the point query joins a top-k-bounded
    relation against the 1,024-row merged sketch (broadcast)."""
    li = spark.table("lineitem").select(
        F.col("l_partkey").alias("key"), F.year("l_shipdate").alias("part_year")
    )
    jrange = F.broadcast(
        spark.range(_CMS_D).select(F.col("id").cast("int").alias("j"))
    )
    bucket = F.conv(
        F.expr("substr(h, 2 * j + 1, 2)"), 16, 10
    ).cast("int")
    digest = F.sha2(F.col("key").cast("string"), 256)
    cells = (
        li.withColumn("h", digest)
        .crossJoin(jrange)
        .withColumn("bucket", bucket)
        .groupBy("part_year", "j", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    merged = cells.groupBy("j", "bucket").agg(F.sum("c").cast("long").alias("c"))
    tops = (
        li.groupBy("key")
        .agg(F.count("*").cast("long").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "key")
        .limit(_CMS_TOP)
    )
    probes = (
        tops.withColumn("h", digest).crossJoin(jrange).withColumn("bucket", bucket)
    )
    return (
        probes.join(F.broadcast(merged), ["j", "bucket"])
        .groupBy("key", "true_cnt")
        .agg(F.min("c").alias("est_cnt"))
        .select(
            F.col("key").alias("l_partkey"),
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") >= F.col("true_cnt")).alias("never_undercounts"),
        )
        .orderBy(F.desc("true_cnt"), "l_partkey")
    )
