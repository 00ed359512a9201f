"""Subquery / HAVING / CTE / anti-join query shapes (SURVEY.md §2.2).

The reference's ``.sql`` steps pass arbitrary DuckDB SQL through opaquely
(reference ``src/shelf/tables.py:155-181``), so correlated subqueries,
``HAVING``, ``WITH``-CTEs, ``NOT IN`` and disjunctive predicates are all
reachable surface. Each shape below is expressed Spark-first: correlated
scalar subqueries decorrelate into an aggregate + join (the same rewrite
Catalyst's ``RewriteCorrelatedScalarSubquery`` does for SQL input — doing
it by hand in the DataFrame API keeps the plan explicit), and scalar
"compare against a global aggregate" subqueries become a 1-row broadcast
cross join so the fact scan never re-reads.

Scale notes:
- every per-group threshold (q11/q15/q17/q18) is computed by a
  partial+final hash agg over the fact table, then joined back; the
  thresholds table is orders-of-magnitude smaller than the fact and is
  broadcast — no extra fact shuffle beyond the one the agg itself needs.
- single-row aggregates (q11's total, q15's max, q22's avg) are
  broadcast cross joins: one scalar shipped to every executor.
- ``NOT IN`` (q16) over a provably non-null key compiles to a broadcast
  left-anti join; the null-aware variant (NAAJ) would materialize the
  same plan plus a null-check — the testdata key is NOT NULL so the
  simple anti join is exactly equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .num import DEC, dsum, dsum_i, sql_dsum, sql_dsum_i
from .registry import query

_REVENUE = "l_extendedprice * (1 - l_discount)"


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Outer join with a join-side residual predicate, then a second agg
    # over the first agg's (much smaller) output — the classic q13 shape.
    cust = spark.table("customer")
    orders = spark.table("orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q11_important_parts",
    oracle=f"""
    SELECT l_partkey, {sql_dsum_i('l_extendedprice * l_quantity', 2)} AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(sum(CAST(floor((l_extendedprice * l_quantity) * 100.0 + 0.5) AS DECIMAL(18,0))) AS DOUBLE) / 100.0
           > (SELECT CAST(sum(CAST(floor((l_extendedprice * l_quantity) * 100.0 + 0.5) AS DECIMAL(18,0))) AS DOUBLE) / 100.0
                     / count(DISTINCT l_partkey) * 1.5
              FROM lineitem)
    ORDER BY part_value DESC, l_partkey
    LIMIT 100
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HAVING against a global-aggregate scalar subquery. The threshold is
    # 1.5x the mean per-part value — scale-invariant, so the query keeps
    # returning a top slice as part count grows with SF. Both aggs are
    # decimal (exact, order-independent) so the comparison is
    # engine-identical; the 1-row threshold broadcasts.
    li = spark.table("lineitem")
    value = F.floor(
        (F.col("l_extendedprice") * F.col("l_quantity")) * 100.0 + F.lit(0.5)
    ).cast("decimal(18,0)")
    per_part = li.groupBy("l_partkey").agg(
        (F.sum(value).cast("double") / 100.0).alias("value_dbl")
    )
    total = li.agg(
        (
            F.sum(value).cast("double") / 100.0
            / F.countDistinct("l_partkey") * F.lit(1.5)
        ).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dbl") > F.col("threshold"))
        .select(
            "l_partkey",
            F.round(F.col("value_dbl"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
        .limit(100)
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {sql_dsum_i(_REVENUE, 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CTE + scalar-subquery-over-the-CTE. The revenue aggregate is reused
    # for both the max and the final filter; equality is on the rounded
    # decimal sum so both engines agree bitwise.
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_i(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = spark.table("supplier")
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT IN over a never-null key → broadcast left-anti join (see module
    # docstring for the NAAJ equivalence argument).
    part = spark.table("part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = spark.table("supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = spark.table("lineitem")
    return (
        # bad_supp is a filtered slice of supplier, which grows with SF —
        # no explicit hint; AQE's size stats broadcast it while it fits.
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        # part (even filtered to ~15%) grows with SF → no hint, AQE decides
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT round({sql_dsum_i('l_extendedprice', 2)} / 7.0, 2)
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Correlated scalar subquery, decorrelated by hand: per-part avg over
    # the *whole* lineitem (not just the brand slice), broadcast back onto
    # the filtered fact rows. l_quantity is integral so the double sum in
    # avg() is exact and both engines agree on the threshold.
    li = spark.table("lineitem")
    part = spark.table("part").filter(F.col("p_brand") == "Brand#23")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        # Neither side is hinted: part grows with SF, and thresholds is a
        # part-cardinality aggregate over all of lineitem — broadcasting it
        # would OOM at scale. Both joins share l_partkey, so the shuffle on
        # that key is reused across them (one exchange of lineitem).
        li.join(part, li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(dsum_i(F.col("l_extendedprice"), 2) / 7.0, 2).alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IN-subquery with HAVING → semi join against an aggregated key set.
    # The key set shares its grouping with the outer agg, so AQE can reuse
    # the exchange; l_quantity is integral → plain double sum is exact.
    li = spark.table("lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 200)
        .select("l_orderkey")
    )
    orders = spark.table("orders")
    cust = spark.table("customer")
    return (
        li.join(big_orders.withColumnRenamed("l_orderkey", "b_orderkey"),
                li.l_orderkey == F.col("b_orderkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        # customer scales with SF — no explicit hint (AQE size-decides)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {sql_dsum_i(_REVENUE, 4)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Disjunction of conjunctive predicates spanning both join sides. The
    # per-side *implied* predicates CAN be pushed without changing
    # semantics: every disjunct requires p_brand ∈ {12,23,34} ∧ p_size ≤ 15
    # and l_quantity ∈ [1,30], so both scans are pre-filtered before the
    # join and the exact disjunction re-checked on the join output. part is
    # un-hinted (grows with SF) — the brand filter makes it small enough
    # for AQE to auto-broadcast at moderate SF.
    li = spark.table("lineitem").filter(F.col("l_quantity").between(1, 30))
    part = spark.table("part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & F.col("p_size").between(1, 15)
    )
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            dsum_i(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
    )


@query(
    "q22_idle_wealthy_customers",
    oracle=f"""
    SELECT c_mktsegment, count(*) AS numcust, {sql_dsum_i('c_acctbal', 2)} AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE)
                              / count(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scalar-aggregate subquery (broadcast 1-row cross join) + NOT EXISTS
    # (anti join on a filtered order set). TPC-H q22 shape adapted to this
    # testdata: every customer has *some* order, so "idle" = no urgent one.
    cust = spark.table("customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    urgent = spark.table("orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum_i(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {sql_dsum_i('volume', 4)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             {_REVENUE} AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The same dimension (nation) joins twice under different roles — the
    # classic q7 self-join-of-a-dim. Only the bounded nation sides carry an
    # explicit broadcast hint; supplier/customer grow with SF, so AQE's
    # size-based decision governs them (auto-broadcast at small SF,
    # sort-merge at scale).
    li = spark.table("lineitem")
    supp = spark.table("supplier")
    orders = spark.table("orders")
    cust = spark.table("customer")
    n1 = spark.table("nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = spark.table("nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            dsum_i(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q21_sole_late_supplier",
    oracle="""
    SELECT s_name, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND date_diff('day', o_orderdate, l1.l_shipdate) > 60
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND date_diff('day', o_orderdate, l3.l_shipdate) > 60
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The q21 shape: EXISTS + correlated NOT EXISTS, both self-joins on
    # the fact table. Decorrelated into ONE per-order aggregate —
    # EXISTS(other supplier) ⇔ n_suppliers ≥ 2, NOT EXISTS(other late
    # supplier) ⇔ exactly one late supplier (which is l1's, since l1 is
    # late). One extra fact shuffle replaces two correlated rescans; at
    # 100 TB the per-order stats relation is |orders|-sized, joined back
    # on the key the agg already partitioned by, so AQE reuses the
    # exchange.
    orders = spark.table("orders").filter(F.col("o_orderstatus") == "F")
    li = spark.table("lineitem")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    supp = spark.table("supplier")
    return (
        lo.filter(F.col("is_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        # supplier scales with SF — no explicit hint (AQE size-decides)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
