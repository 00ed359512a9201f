"""Window-function operator inventory (SURVEY.md §2.2 window row).

Ranking, analytic (lag/lead/first/last), running aggregates with ROWS
frames, value-based RANGE frames, and ntile — each with a deterministic
ordering (explicit tie-breakers) so results hash identically to DuckDB.

Scale note: every window here partitions by a key whose cardinality grows
with the data (custkey, suppkey, segment), so the shuffle is well-spread;
none uses a global (unpartitioned) window over a base table, which would
serialize to one task at 100 TB. The one query with global-ordering
semantics (fn: window_ntile) computes the global rank distributively —
range repartition + local rank + broadcast partition offsets — and its
only unpartitioned windows run over the per-partition counts relation,
whose size is the partition count, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .num import davg_win_i, dsum_win_i, sql_davg_over_i, sql_dsum_over_i
from .registry import query


@query(
    "window_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(c_acctbal, 2) AS acctbal,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return spark.table("customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           floor(o_totalprice * 100 + 0.5) / 100                       AS total,
           floor(lag(o_totalprice)  OVER w * 100 + 0.5) / 100          AS prev_total,
           floor(lead(o_totalprice) OVER w * 100 + 0.5) / 100          AS next_total,
           floor((o_totalprice - lag(o_totalprice) OVER w) * 100 + 0.5) / 100 AS delta_vs_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _round_ieee, not F.round: Spark rounds a raw double via its exact
    # decimal expansion (HALF_UP on BigDecimal) while DuckDB rounds
    # through float arithmetic — on >2dp inputs like 2000.03499…9 the
    # two disagree (2000.03 vs 2000.04). The shared floor(x·100+0.5)/100
    # executes identical IEEE ops on both engines (adversarial-fixture
    # find, r9; identity on the lake's 2dp prices).
    from .num import _round_ieee

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    total = F.col("o_totalprice")
    return spark.table("orders").select(
        "o_custkey",
        "o_orderkey",
        _round_ieee(total, 2).alias("total"),
        _round_ieee(F.lag(total).over(w), 2).alias("prev_total"),
        _round_ieee(F.lead(total).over(w), 2).alias("next_total"),
        _round_ieee(total - F.lag(total).over(w), 2).alias("delta_vs_prev"),
    )


_W_RUN = (
    "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)
_W_MOV = (
    "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
    " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
)


@query(
    "window_running",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {sql_dsum_over_i('o_totalprice', _W_RUN, 2)} AS running_total,
           {sql_davg_over_i('o_totalprice', _W_MOV, 2)} AS moving_avg3,
           CAST(count(*) OVER {_W_RUN} AS BIGINT)  AS nth_order
    FROM orders
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Windowed sums also go through exact decimal aggregation: DuckDB's
    # segment-tree window aggregation reorders double additions vs Spark's
    # running accumulator.
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_mov = w.rowsBetween(-2, W.currentRow)
    return spark.table("orders").select(
        "o_custkey",
        "o_orderkey",
        dsum_win_i(F.col("o_totalprice"), w_run, 2).alias("running_total"),
        davg_win_i(F.col("o_totalprice"), w_mov, 2).alias("moving_avg3"),
        F.count("*").over(w_run).cast("long").alias("nth_order"),
    )


_W_RANGE = (
    "(PARTITION BY o_custkey ORDER BY epoch_s"
    " RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)"
)


@query(
    "window_range_frame",
    oracle=f"""
    SELECT o_custkey, o_orderkey, epoch_s,
           {sql_dsum_over_i('o_totalprice', _W_RANGE, 2)} AS trailing_90d_total
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
      FROM orders
    ) t
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Value-based RANGE frame: trailing 90 days of spend per customer,
    # ordered by epoch seconds (RANGE needs a numeric ordering key in both
    # engines).
    o = spark.table("orders").withColumn(
        "epoch_s", F.unix_timestamp("o_orderdate").cast("long")
    )
    w = W.partitionBy("o_custkey").orderBy("epoch_s").rangeBetween(-90 * 86400, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "epoch_s",
        dsum_win_i(F.col("o_totalprice"), w, 2).alias("trailing_90d_total"),
    )


@query(
    "window_ntile",
    oracle="""
    SELECT c_custkey,
           ntile(4)   OVER (ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile,
           CAST(round(percent_rank() OVER (ORDER BY c_acctbal DESC, c_custkey) * 1000)
                AS BIGINT) AS pct_rank_k
    FROM customer
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global ranking WITHOUT a global window (which would serialize the full
    # table through one task): range-repartition on the sort key so partition
    # p holds a contiguous key range, rank locally per partition, then shift
    # by broadcast per-partition offsets. The only global windows run over the
    # per-partition counts relation — bounded by the partition count, not the
    # data. ntile/percent_rank are recomputed from the exact global rank with
    # the engines' own formulas, so values match the oracle bit-for-bit.
    # (The ordering key is unique — custkey tiebreak — so rank == row_number.)
    n_parts = max(1, spark.sparkContext.defaultParallelism)
    base = (
        spark.table("customer")
        .select("c_custkey", "c_acctbal")
        .repartitionByRange(n_parts, F.desc("c_acctbal"), F.asc("c_custkey"))
        .withColumn("pid", F.spark_partition_id())
    )
    counts = base.groupBy("pid").agg(F.count("*").alias("cnt"))
    # Bounded (≤ n_parts rows): the single-task offsets window is
    # intended; the non-foldable constant partition key keeps the spec
    # non-empty so WindowExec's no-partition warning can't drown gate
    # logs (same idiom as prefix.attach_prefix_sums).
    const = F.pmod(F.col("pid"), F.lit(1))
    w_off = W.partitionBy(const).orderBy("pid").rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("offset"),
        F.sum("cnt").over(W.partitionBy(const)).alias("n_total"),
    )
    w_local = W.partitionBy("pid").orderBy(F.desc("c_acctbal"), "c_custkey")
    rn = F.col("local_rn") + F.col("offset")
    n = F.col("n_total")
    # ntile(k): first (n mod k) buckets get ceil(n/k) rows, the rest floor(n/k)
    k = F.lit(4)
    big = F.floor(n / k) + 1          # ceil bucket size
    rem = n % k                       # number of ceil-sized buckets
    split = big * rem                 # rows covered by ceil-sized buckets
    bucket = F.when(rn <= split, F.ceil(rn / big)).otherwise(
        rem + F.ceil((rn - split) / F.floor(n / k))
    )
    return (
        base.withColumn("local_rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "pid")
        .select(
            "c_custkey",
            bucket.cast("long").alias("bal_quartile"),
            F.round((rn - 1).cast("double") / (n - 1) * 1000)
            .cast("long")
            .alias("pct_rank_k"),
        )
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT c_nationkey,
           first_value(c_name) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest,
           last_value(c_name)  OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
    FROM customer
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        spark.table("customer")
        .select(
            "c_nationkey",
            F.first("c_name").over(w).alias("richest"),
            F.last("c_name").over(w).alias("poorest"),
        )
        .distinct()
    )


@query(
    "window_cume_nth",
    oracle="""
    SELECT DISTINCT c_nationkey,
           CAST(round(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_k
           FROM customer
           WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cume_dist = rank_with_ties/n — exact integer ratio, one IEEE
    # division → engine-identical; scaled to an integer for the hash.
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        spark.table("customer")
        .select(
            "c_nationkey",
            F.round(F.cume_dist().over(w) * 1000000).cast("long").alias("cume_k"),
        )
        .distinct()
    )


@query(
    "window_nth_value",
    oracle="""
    SELECT c_nationkey, runner_up FROM (
      SELECT c_nationkey, c_custkey,
             nth_value(c_name, 2) OVER (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS runner_up,
             row_number() OVER (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn = 1
    """,
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nth_value over the full-partition frame (second-richest customer per
    # nation), reduced to one row per partition via row_number — both
    # window functions share one partitioning, so one shuffle total.
    frame = (
        W.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    order = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        spark.table("customer")
        .select(
            "c_nationkey",
            F.nth_value("c_name", 2).over(frame).alias("runner_up"),
            F.row_number().over(order).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "runner_up")
    )
