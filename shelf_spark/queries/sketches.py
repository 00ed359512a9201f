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


@query("rollup_hll_mergeable")  # rows-only: HLL estimates are engine-specific
def rollup_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct-user estimates from stored HLL sketches, plus an
    'ALL' row whose estimate comes from merging the daily sketches —
    never re-scanning raw events. The persist-sketches-merge-later
    contract is what makes 100 TB rollup hierarchies cheap: day→month→
    year each aggregates ~365 small binary blobs, not 10^12 raw rows."""
    daily_sk = (
        spark.table("events")
        .select(F.date_trunc("day", "ts").cast("date").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    daily = daily_sk.select(
        F.col("day").cast("string").alias("grain"),
        F.hll_sketch_estimate("sk").alias("est_users"),
    )
    merged = daily_sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    ).select(F.lit("ALL").alias("grain"), "est_users")
    return daily.unionByName(merged).orderBy("grain")
