"""Physical-layout optimization utilities: bucketing for co-located joins.

At 100 TB, the single biggest avoidable cost is re-shuffling a fact table
on the same join key for every query. The lakehouse answer is to *store*
the table hash-bucketed on that key: two tables bucketed on the same key
with the same bucket count join with **zero exchange** — each task reads
matching bucket files from both sides (sorted buckets additionally skip
the sort of a sort-merge join).

The reference has no analogue (single-file tables, DuckDB in-process);
this is pure Spark-engine capability, exposed so framework table steps
can opt into it for their hottest join keys.

Bucket-count sizing: target 100-200 MB per bucket file at final scale;
for a 10 TB fact table that's ~65k buckets. Too few → giant tasks and
skew; too many → small-file storms. Bucket pruning (Spark 3.x) also
turns point predicates on the bucket key into single-bucket scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    num_buckets: int,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket-sorted)
    table. Joins/aggregations on ``bucket_keys`` between tables with
    identical bucketing then plan without an Exchange. With ``path`` the
    table is EXTERNAL (data at ``path``, only metadata in the catalog) —
    callers that may run under a caller-owned session (whose managed
    warehouse could point anywhere, e.g. the process cwd) should pass an
    explicit path."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def is_shuffle_free_join(spark: SparkSession, left: str, right: str, on: list[str]) -> bool:
    """True when joining ``left`` ⋈ ``right`` on ``on`` plans with no
    Exchange on either input (the bucketing contract held)."""
    df = spark.table(left).join(spark.table(right), on)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) interleaved-bit key over 2+ integer columns —
    pure JVM bit arithmetic, no UDF.

    Sorting a table by this key before writing gives every parquet file a
    tight min/max envelope on EVERY participating column (a plain sort
    only tightens the leading column), so predicates on any of them skip
    row groups / files via statistics — the write-side analogue of a
    multi-column index. Each column is rank-normalized by the caller (or
    already integer-dense); only the low ``bits`` bits participate.
    """
    from pyspark.sql import functions as F

    parts = []
    for b in range(bits):
        for ci, c in enumerate(cols):
            src = F.col(c) if isinstance(c, str) else c
            bit = F.shiftright(src.cast("long"), b).bitwiseAND(F.lit(1))
            parts.append(F.shiftleft(bit, b * len(cols) + ci))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet laid out in Z-order on ``zorder_cols``: repartition by
    range on the interleaved key (locality across files), then sort within
    partitions (locality across row groups)."""
    from pyspark.sql import functions as F

    keyed = df.withColumn("_zkey", zorder_key(zorder_cols, bits))
    (
        keyed.repartitionByRange(num_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot ``on`` key of ``fact``
    over ``salt`` shuffle partitions by appending a random salt, and
    replicate every ``dim`` row ``salt`` times to match.

    AQE's skew-join split (on by default here) handles most skew at the
    *partition* level; explicit salting is the remaining tool when a
    single key exceeds what one task can hold even after splits (e.g. a
    null/default key owning 10% of 100 TB). Cost: dim side × salt — use
    only when dim ≪ fact.
    """
    from pyspark.sql import functions as F

    salted_fact = fact.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    salts = fact.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
    salted_dim = dim.crossJoin(F.broadcast(salts))
    out = salted_fact.join(salted_dim, [on, "_salt"], how)
    return out.drop("_salt")


def runtime_bloom_filter_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime (bloom-filter) join pruning — the 100 TB lever Spark's
    ``InjectRuntimeFilter`` rule provides: when a join's build side is
    selectively FILTERED, Spark aggregates a bloom filter over its join
    keys at runtime and pushes a ``might_contain`` probe beneath the
    probe side's scan, so a 100 TB fact table discards non-matching rows
    BEFORE the shuffle instead of after it (the runtime analogue of
    static partition pruning, for arbitrary keys).

    The feature is threshold-gated for exactly the scale it targets —
    ``applicationSideScanSizeThreshold`` defaults to 10 GB so small scans
    skip the overhead — which is why local-SF plans never show it; this
    demo lowers the thresholds to force injection at test scale and
    returns the joined frame whose plan carries the filter
    (plan-asserted in tests/test_optimize.py). On a real lake the only
    requirement is leaving ``spark.sql.optimizer.runtime.bloomFilter
    .enabled`` on (the default) — no query change.
    """
    from pyspark.sql import functions as F

    from .data import register_views

    register_views(spark, sf_dir)
    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # the rule only fires on shuffle joins (a broadcast already
        # prunes via its hashed relation)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in conf.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # selective build side: one order priority slice of orders
        o = spark.table("orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.table("lineitem")
        out = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n_items"))
        # force planning NOW, while the thresholds are lowered
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
