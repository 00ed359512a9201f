"""Core relational operator inventory (SURVEY.md §2.2 `B`-rows).

These are the operators the reference reaches *by delegation*: any DuckDB
SQL a user writes in a ``.sql`` step or `shelf db` query (reference
``src/shelf/tables.py:155-181``, ``src/shelf/__init__.py:364-400``). Here
each is expressed Spark-first via the DataFrame API and checked against an
ANSI-SQL DuckDB oracle.

Scale notes on the shapes used below:
- dimension⨝fact joins (region/nation/customer vs lineitem/orders) rely on
  Catalyst auto-broadcast (dims ≪ 10 MB even at sf 1000); at 100 TB the same
  plan broadcasts dims to every executor — no shuffle of the fact table for
  those joins.
- top-k uses orderBy+limit which Catalyst executes as
  TakeOrderedAndProject (per-partition heap + driver merge of k rows, never
  a full sort of the fact table).
- aggregations are partial+final hash aggregates (map-side combine) by
  construction; rollup/cube expand grouping sets before the shuffle.

Money sums/averages go through :mod:`.num` (exact decimal aggregation) so
both engines produce bitwise-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .num import (
    DEC,
    _round_ieee,
    davg,
    davg_i,
    dsum,
    dsum_i,
    grid_quantiles,
    sql_davg,
    sql_davg_i,
    sql_dsum,
    sql_dsum_i,
)
from .registry import query

_REVENUE = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# Flagship scan → filter → hash-agg → sort (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum_i('l_quantity', 2)}                                   AS sum_qty,
           {sql_dsum_i('l_extendedprice', 2)}                              AS sum_base_price,
           {sql_dsum_i(_REVENUE, 4)}                                       AS sum_disc_price,
           {sql_dsum_i(f'{_REVENUE} * (1 + l_tax)', 6)}                    AS sum_charge,
           {sql_davg_i('l_quantity', 2)}                                   AS avg_qty,
           {sql_davg_i('l_extendedprice', 2)}                              AS avg_price,
           {sql_davg_i('l_discount', 2)}                                   AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Money sums use the integer-grid decimal tier (num.dsum_i): inputs are
    # fixed-point (prices/rates 2dp, so the 2- and 3-factor products are
    # exact at 4/6dp); pre-rounding to the scaled integer with pure IEEE
    # ops avoids the per-row double→decimal cast that dominated the
    # decimal(30,8) tier (~70% of q1 wall — see SCALE.md drift analysis),
    # while keeping order-independent exact accumulation. dsum_i/davg_i at
    # the same scale share one Catalyst-deduped accumulator.
    li = spark.table("lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_i(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum_i(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum_i(disc_price, 4).alias("sum_disc_price"),
            dsum_i(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            davg_i(F.col("l_quantity"), 2).alias("avg_qty"),
            davg_i(F.col("l_extendedprice"), 2).alias("avg_price"),
            davg_i(F.col("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum_i(_REVENUE, 4)} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    cust = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = spark.table("orders").filter(F.col("o_orderdate") < cutoff)
    li = spark.table("lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        # customer grows with scale factor, so no explicit broadcast hint here:
        # AQE's size-based decision broadcasts it at small SF and falls back to
        # sort-merge at scale (explicit hints are honored unconditionally and
        # would OOM the executors at 100x).
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_i(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {sql_dsum_i(_REVENUE, 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.table("customer")
    orders = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = spark.table("lineitem")
    supp = spark.table("supplier")
    nat = spark.table("nation")
    reg = spark.table("region").filter(F.col("r_name") == "ASIA")
    return (
        # customer/supplier scale with SF — no broadcast hints (AQE decides);
        # nation/region are bounded dims (25/5 rows at any SF) — hint them.
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_i(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum_i(_REVENUE, 4)} AS revenue,
           round(c_acctbal, 2) AS acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.table("customer")
    orders = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = spark.table("lineitem").filter(F.col("l_returnflag") == "R")
    nat = spark.table("nation")
    return (
        # customer scales with SF (no hint, AQE decides); nation is a bounded dim.
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_i(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum_i(_REVENUE, 4)} AS promo_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pure scan-agg: every predicate reaches the parquet scan; the agg is
    # partial+final with a single scalar exchange.
    li = spark.table("lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum_i(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("promo_revenue"))
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXISTS → left-semi join (no row multiplication, build side streams).
    # (TPC-H q4 uses commit/receipt dates; this testdata carries shipdate,
    # so the lateness predicate is l_shipdate > o_orderdate.)
    orders = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = spark.table("lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q12_ship_lag_buckets",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS ontime_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q12_ship_lag_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Conditional aggregation over a fact-fact join (q12 shape; shipmode →
    # priority, commit/receipt lag → ship lag for this testdata's columns).
    orders = spark.table("orders")
    li = spark.table("lineitem")
    lag_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(lag_days > 60, 1).otherwise(0)).alias("late_count"),
            F.sum(F.when(lag_days <= 60, 1).otherwise(0)).alias("ontime_count"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q14_promo_share",
    oracle=f"""
    SELECT round(
             100.0 * {sql_dsum_i(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE 0 END", 4)}
                   / {sql_dsum_i(_REVENUE, 4)}, 6)
           AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fact ⋈ part + conditional integer-grid aggregation; one scalar output.
    # part grows with SF (200k×SF rows) so it carries NO broadcast hint —
    # AQE size-decides (broadcasts at small SF, shuffles when it must).
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = spark.table("part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * dsum_i(promo_rev, 4) / dsum_i(rev, 4),
                6,
            ).alias("promo_share_pct")
        )
    )


# ---------------------------------------------------------------------------
# Scan / projection / filter (pushdown surface)
# ---------------------------------------------------------------------------


@query(
    "scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-08 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_returnflag IN ('A', 'R')
    """,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Projection + predicates all reach the Parquet scan (PushedFilters /
    # 3-column ReadSchema — verified via explain in tests).
    return (
        spark.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-08 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & F.col("l_returnflag").isin("A", "R")
        )
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
    )


@query(
    "scan_inline_literals",
    oracle="""
    SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y'
    """,
)
def scan_inline_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Inline literal rows — the reference's own SQL-step test fixture shape
    # (reference tests/test_tables.py:183-191).
    return spark.sql("SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y'")


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------


@query(
    "join_left_outer",
    oracle=f"""
    SELECT c_custkey,
           count(o_orderkey)                                    AS n_orders,
           coalesce({sql_dsum_i('o_totalprice', 2)}, 0.0)            AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.table("customer")
    orders = spark.table("orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum_i(F.col("o_totalprice"), 2), F.lit(0.0)).alias("total_spent"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey
    FROM orders
    RIGHT JOIN customer ON o_custkey = c_custkey AND o_totalprice > 400000
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.table("customer")
    orders = spark.table("orders")
    cond = (orders.o_custkey == cust.c_custkey) & (orders.o_totalprice > 400000)
    return orders.join(cust, cond, "right").select("c_custkey", "c_name", "o_orderkey")


@query(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(c.nk, s.nk)     AS nationkey,
           coalesce(n_cust, 0)      AS n_cust,
           coalesce(n_supp, 0)      AS n_supp
    FROM c FULL JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer").groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_cust"))
    s = spark.table("supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(F.count("*").alias("n_supp"))
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.table("customer")
    orders = spark.table("orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.table("customer")
    orders = spark.table("orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti_survivors",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    )
    """,
)
def join_anti_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-vacuous anti-join twin: customers with NO 1998+ order.

    `join_anti` (customers with no orders at all) has returned 0 rows on
    every sf0.01 driver run since r01 — 0-vs-0 proves the plan runs but
    not that anti semantics are right. Filtering the build side to 2001+
    orders guarantees survivors at EVERY corpus SF (65 at sf0.001, 615
    at sf0.01 — the r13 1998 cutoff was itself vacuous at sf0.001,
    r13 VERDICT ask #6), so a wrong join type or null-handling bug can
    no longer hide behind an empty result.

    Scale shape: identical to `join_anti` — one hash exchange per side
    on the join key (the date filter prunes the build side before the
    shuffle; at 100 TB AQE broadcasts it when a tight filter makes it
    small)."""
    cust = spark.table("customer")
    orders = spark.table("orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_nonequi",
    oracle=f"""
    SELECT n_name,
           count(*) AS n_pairs,
           {sql_davg_i('c_acctbal - s_acctbal', 2)} AS avg_gap
    FROM supplier
    JOIN customer ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    JOIN nation   ON n_nationkey = s_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = spark.table("supplier")
    cust = spark.table("customer")
    nat = spark.table("nation")
    return (
        supp.join(
            cust,
            (supp.s_nationkey == cust.c_nationkey) & (supp.s_acctbal < cust.c_acctbal),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_pairs"),
            davg_i(cust.c_acctbal - supp.s_acctbal, 2).alias("avg_gap"),
        )
        .orderBy("n_name")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, seg.c_mktsegment AS segment
    FROM region
    CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = spark.table("region").select("r_name")
    seg = spark.table("customer").select("c_mktsegment").distinct()
    return reg.crossJoin(seg).select("r_name", F.col("c_mktsegment").alias("segment"))


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------


@query(
    "agg_stats",
    oracle=f"""
    SELECT count(*)                                   AS n_rows,
           CAST(count(DISTINCT l_suppkey) AS BIGINT)  AS n_supp,
           {sql_dsum_i('l_quantity', 2)}                   AS sum_qty,
           {sql_davg_i('l_extendedprice', 2)}              AS avg_price,
           round(min(l_extendedprice), 2)             AS min_price,
           round(max(l_extendedprice), 2)             AS max_price,
           round(stddev_samp(l_discount), 4)          AS sd_disc,
           round(var_samp(l_tax), 4)                  AS var_tax
    FROM lineitem
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table("lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        dsum_i(F.col("l_quantity"), 2).alias("sum_qty"),
        davg_i(F.col("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("l_discount"), 4).alias("sd_disc"),
        F.round(F.var_samp("l_tax"), 4).alias("var_tax"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum_i('l_quantity', 2)} AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    HAVING count(*) > 0
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING count(*) > 0 in the oracle pins the cross-engine
    empty-input convention: the SQL standard's degenerate grand-total
    row (the () grouping set over ZERO input rows) is emitted by DuckDB
    but not by Spark's rollup/cube. Every real grouping-set row
    aggregates ≥1 input row, so the filter only ever drops that one
    zero-input row — a byte-level no-op on every non-empty corpus
    (r10 empty-corpus find; same pin on agg_cube/agg_grouping_sets)."""
    return (
        spark.table("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum_i(F.col("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           {sql_dsum_i('o_totalprice', 2)} AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING count(*) > 0
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Empty-input convention pinned in the oracle — see agg_rollup.
    return (
        spark.table("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum_i(F.col("o_totalprice"), 2).alias("total"))
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum_i('l_extendedprice', 2)} AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    HAVING count(*) > 0
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HAVING pins the empty-input convention on BOTH engines (identical
    # shared SQL text): only the ()-set's zero-input row can have
    # count(*) = 0, so this is a no-op on any non-empty corpus — see
    # agg_rollup's docstring for the full rationale.
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, {sql_dsum_i('l_extendedprice', 2)} AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        HAVING count(*) > 0
        """
    )


@query(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum_i("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 2)} AS qty_f,
           {sql_dsum_i("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 2)} AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    piv = (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum_i(F.col("l_quantity"), 2))
    )
    return piv.select(
        "l_returnflag", F.col("F").alias("qty_f"), F.col("O").alias("qty_o")
    )


@query(
    "agg_median_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(CASE WHEN NOT isnan(l_quantity)
                               THEN l_quantity END, 0.5), 4)      AS median_qty,
           round(quantile_cont(CASE WHEN NOT isnan(l_extendedprice)
                               THEN l_extendedprice END, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles via FIXED-WIDTH HISTOGRAM + EXACT
    REFINE (r13, VERDICT r12 ask #4 — see :func:`num.grid_quantiles`
    for the full plan rationale). The r12 compressed-domain rank window
    sorted the whole near-unique price column per group (583k distinct
    of 600k rows at sf0.1); now the exchange and window carry only the
    bucket histogram — bounded by value-range/width at ANY data scale —
    and a second scan refines the two covering buckets exactly. Widths:
    qty is integer-valued in a ~50-wide range (width 1 → ≤50 buckets,
    refine trivial); price spans ~[900, 105000] (width 64 → ~1.6k
    buckets, refine ~1/800 of rows). Any width is correct — it only
    trades histogram size against refine selectivity.

    NaN convention (r13, r12 ADVICE): NaN measure values carry ZERO
    weight here, while a bare ``quantile_cont`` ranks NaN as the
    largest value — so the oracle maps NaN → NULL inside
    ``quantile_cont`` (DuckDB skips NULLs), aligning both engines on
    the exclude-NaN semantics."""
    li = spark.table("lineitem")
    stacked = li.selectExpr(
        "l_returnflag AS grp",
        "stack(2, 'qty',   CAST(l_quantity      AS DOUBLE),  1.0D,"
        "         'price', CAST(l_extendedprice AS DOUBLE), 64.0D) AS (m, v, wd)",
    )
    q = grid_quantiles(stacked, {"qty": 0.5, "price": 0.9})
    return (
        q.withColumn("val", F.round("val", 4))
        .groupBy("grp")
        .pivot("m", ["qty", "price"])
        .agg(F.first("val"))
        .select(
            F.col("grp").alias("l_returnflag"),
            F.col("qty").alias("median_qty"),
            F.col("price").alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS hll_within_tol,
           TRUE AS pctl_within_band
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx count-distinct + approx percentile, ε-BOUNDED oracle
    (r11, VERDICT r10 ask #5): Spark's HLL++ and DuckDB's HLL give
    different estimates by design, so the raw estimates can't be
    value-compared — but the ACCURACY CONTRACT can. The query computes
    both the sketch estimate and the exact value inside Spark and emits
    the exact count plus per-group within-tolerance assertion columns;
    the oracle recomputes the exact count in DuckDB and pins the
    assertions TRUE. A drifting sketch (or a broken merge path) flips a
    boolean and fails the value hash — the former pytest-only tolerance
    check now lives in the oracle gate. Tolerances: HLL++ at rsd=0.02
    within 10% (5×rsd — ≫5σ of the estimator; exact-mode below the
    sparse threshold), approx_percentile(accuracy=1000) inside the
    DISCRETE-RANK p45–p55 band (rank error ≤ n/1000 ≪ 5% of n). The
    sketch path is the one that matters at 100 TB: exact distinct =
    full shuffle of the key; HLL = constant memory per group,
    mergeable map-side.

    Plan shape (r12, VERDICT r11 ask #1): the r11 version put the
    sketches, two exact ``percentile()`` buffers and ``countDistinct``
    in ONE ``.agg()``, which Catalyst's distinct rewrite expands into
    an aggregation keyed by (flag, partkey) — the exact-percentile
    value buffers and HLL state rode the distinct-key exchange and got
    merged per (flag, partkey) group (~8× a comparable agg at sf0.1;
    unbounded at 100 TB). Split into three arms joined on ≤|groups|
    rows: (a) sketch-only pass — constant state per group, map-side
    combinable; (b) ``countDistinct`` ALONE — the only pass keyed by
    the distinct key, no value buffers riding it; (c) the p45/p55 band
    from the compressed integer-cents domain (the agg_weighted_median
    pattern). Band semantics moved from INTERPOLATED to DISCRETE-RANK
    (r11 ADVICE): for a 2-row group [1.0, 2.0] the element-valued
    estimate is 1.0 but interpolated p45 = 1.45, falsely failing the
    old band. The new band [element at rank max(1,⌊0.45n⌋), element at
    rank min(n,⌈0.55n⌉)] contains every element whose rank error is
    ≤ n/1000, at every n."""
    li = spark.table("lineitem")
    # arm (a): sketches only — no distinct rewrite, partial agg map-side
    sk = li.groupBy(F.col("l_returnflag").alias("rf_sk")).agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias(
            "approx_median"
        ),
    )
    # arm (b): the exact distinct count ALONE on the (flag, partkey) exchange
    ex = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("exact_parts")
    )
    # arm (c): discrete-rank band endpoints from the compressed cents domain
    dom = (
        li.filter(
            F.col("l_extendedprice").isNotNull() & ~F.isnan("l_extendedprice")
        )
        .groupBy(
            F.col("l_returnflag").alias("rf_bd"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .agg(F.count("*").alias("w"))
    )
    wcum = (
        W.partitionBy("rf_bd").orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
    )
    c = (
        dom.withColumn("cw", F.sum("w").over(wcum))
        .withColumn("n", F.sum("w").over(W.partitionBy("rf_bd")))
        .withColumn(
            "r_lo", F.greatest(F.lit(1).cast("long"), F.floor(0.45 * F.col("n")))
        )
        .withColumn("r_hi", F.least(F.col("n"), F.ceil(0.55 * F.col("n"))))
    )

    def covers(rank: F.Column) -> F.Column:
        # the domain row whose cumulative-weight interval (cw-w, cw]
        # contains the 1-based rank — exactly one per group
        return (F.col("cw") >= rank) & (F.col("cw") - F.col("w") < rank)

    band = c.groupBy("rf_bd").agg(
        F.max(F.when(covers(F.col("r_lo")), F.col("cents"))).alias("lo_c"),
        F.max(F.when(covers(F.col("r_hi")), F.col("cents"))).alias("hi_c"),
    )
    j = ex.join(
        F.broadcast(sk), F.col("l_returnflag").eqNullSafe(F.col("rf_sk")), "left"
    ).join(
        F.broadcast(band), F.col("l_returnflag").eqNullSafe(F.col("rf_bd")), "left"
    )
    return j.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.greatest(F.lit(0.10) * F.col("exact_parts"), F.lit(2.0))
        ).alias("hll_within_tol"),
        F.coalesce(
            # compare on the same integer grid the band lives on — the
            # estimate is an actual element, and rounding to cents is
            # monotone, so its cents value is in [lo_c, hi_c] whenever
            # its rank is in-band
            F.floor(F.col("approx_median") * 100 + F.lit(0.5))
            .cast("long")
            .between(F.col("lo_c"), F.col("hi_c")),
            # all-null value column: both the estimate and the band are
            # null — the contract is vacuously satisfied
            F.col("approx_median").isNull() & F.col("lo_c").isNull(),
        ).alias("pctl_within_band"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Sort / limit / set ops / dedup
# ---------------------------------------------------------------------------


@query(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, floor(o_totalprice * 100 + 0.5) / 100 AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TakeOrderedAndProject: per-partition heap of 15 + driver merge; never a
    # global sort of orders.
    return (
        spark.table("orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
        # shared IEEE rounding, not F.round — see window_lag_lead's note
        .select(
            "o_orderkey",
            "o_custkey",
            _round_ieee(F.col("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, 'high' AS bucket FROM orders WHERE o_totalprice > 450000
    UNION ALL
    SELECT o_orderkey, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.table("orders")
    hi = orders.filter(F.col("o_totalprice") > 450000).select(
        "o_orderkey", F.lit("high").alias("bucket")
    )
    ur = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("bucket")
    )
    return hi.unionAll(ur)


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.table("orders")
    y97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    y98 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    return y97.intersect(y98)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.table("orders")
    y97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    later = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    # subtract == EXCEPT DISTINCT (exceptAll would keep surplus duplicates)
    return y97.subtract(later)


@query(
    "dedup_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.table("lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "dedup_keep_first",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) t
    WHERE rn = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic dropDuplicates: keep the earliest row per key. (Plain
    # dropDuplicates keeps an arbitrary row — fine for semantics, not for an
    # oracle comparison.)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        spark.table("orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_orderdate").alias("first_orderdate"),
        )
    )


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT c_mktsegment,
           count(*)                 AS n_events,
           {sql_dsum_i('value', 2)}      AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The skew-resistant join as a checked operator: events.user_id has a
    # tiny hot domain (every key is a hot key), the worst case for a hash
    # join shuffle. salted_join spreads each key over 16 salt buckets and
    # replicates the dim side to match; the oracle is the plain join, so
    # the check proves salting is result-invariant. At 100 TB this is the
    # tool for a single key that exceeds one task even after AQE splits.
    from ..optimize import salted_join

    events = spark.table("events")
    cust = spark.table("customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        events.withColumnRenamed("user_id", "c_custkey"), cust, on="c_custkey"
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            dsum_i(F.col("value"), 2).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )
