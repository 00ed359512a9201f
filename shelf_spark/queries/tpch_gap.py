"""TPC-H q2/q20-shaped queries — the last two classic shapes missing from
relational.py/subqueries.py/relational_ext.py, adapted to this testdata
(no partsupp table: lineitem's (part, supplier, price, quantity) facts
stand in for supply relationships, as q11/q16 already do).

Reference parity: shelf runs these as DuckDB SQL steps (reference
src/shelf/tables.py:155-181); with this pair, every TPC-H query shape
q1–q22 has a registered, oracle-checked Spark twin.

Scale notes (100 TB):
- q2's correlated min is decorrelated to a window MIN over the
  aggregated (part, supplier) costs — parts-sized input, no re-scan.
- q20's nested half-of-total threshold is two aggregations of the SAME
  grouped table: Catalyst computes (supp, part) sums once, the per-part
  totals reuse that shuffle's key prefix, and the final semi-join to
  supplier is keyed on s_suppkey.
- nation carries the only broadcast hint (bounded dim); everything
  SF-growing is left to AQE (SCALE.md broadcast policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .registry import query


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             min(round(l_extendedprice / l_quantity, 2)) AS unit_cost
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, l_suppkey, unit_cost
      FROM costs c
      WHERE unit_cost = (
        SELECT min(unit_cost) FROM costs c2 WHERE c2.l_partkey = c.l_partkey
      )
    )
    SELECT p_partkey, p_name, s_name, n_name, unit_cost
    FROM best
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size >= 40
    ORDER BY unit_cost, p_partkey, s_name
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape: cheapest supplier per part (correlated scalar-min
    subquery). Decorrelated to a window MIN over the aggregated
    (part, supplier) unit costs — one shuffle on l_partkey prefix, the
    correlated re-scan of TPC-H's textbook plan never happens. Unit cost
    is rounded to the cent grid BEFORE min/compare so the equality
    predicate is grid-exact on both engines."""
    li = spark.table("lineitem")
    costs = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)).alias(
                "unit_cost"
            )
        )
    )
    w = W.partitionBy("l_partkey")
    best = costs.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    part = spark.table("part").filter(F.col("p_size") >= 40)
    sup = spark.table("supplier")
    nat = spark.table("nation")
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(sup, best.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
        .orderBy("unit_cost", "p_partkey", "s_name")
        .limit(100)
    )


@query(
    "q20_excess_inventory",
    oracle="""
    WITH supply AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'STANDARD'
      GROUP BY l_suppkey, l_partkey
    ), part_total AS (
      SELECT l_partkey, sum(qty) AS total_qty, count(*) AS n_supp
      FROM supply GROUP BY l_partkey
    )
    SELECT s_name, n_name,
           CAST(count(*) AS BIGINT) AS n_dominant_parts
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN supply ON s_suppkey = l_suppkey
    JOIN part_total USING (l_partkey)
    WHERE CAST(qty * n_supp AS DOUBLE) > 1.5 * CAST(total_qty AS DOUBLE)
    GROUP BY s_name, n_name
    ORDER BY n_dominant_parts DESC, s_name
    LIMIT 100
    """,
)
def q20_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape: suppliers supplying more than 1.5× the per-supplier
    average quantity of a part (share-based, so the predicate stays
    selective at every SF — a fixed share threshold empties as supplier
    counts grow). The per-(supp, part) sums and per-part totals are two
    aggregations of one grouped table — the second groupBy reuses the
    first shuffle's l_partkey prefix. qty·n_supp is integer-exact; the
    1.5·total threshold is one identical IEEE multiply-compare.

    Per-part totals are WINDOW aggregates over the grouped supply rows
    (one partition pass inside the l_partkey exchange) rather than a
    second groupBy joined back: the r6 10× smoke showed the join-back
    re-running the whole lineitem⋈part pipeline when exchange reuse
    didn't hold under AQE — the window form has one consumer, nothing
    to re-derive, and strictly fewer exchanges."""
    from pyspark.sql.window import Window as W

    li = spark.table("lineitem")
    part = spark.table("part").filter(F.col("p_type") == "STANDARD")
    supply = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    wp = W.partitionBy("l_partkey")
    dominant = (
        supply.withColumn("total_qty", F.sum("qty").over(wp))
        .withColumn("n_supp", F.count("*").over(wp))
        .filter(
            (F.col("qty") * F.col("n_supp")).cast("double")
            > 1.5 * F.col("total_qty").cast("double")
        )
    )
    sup = spark.table("supplier")
    nat = spark.table("nation")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(dominant, sup.s_suppkey == dominant.l_suppkey)
        .groupBy("s_name", "n_name")
        .agg(F.count("*").alias("n_dominant_parts"))
        .orderBy(F.desc("n_dominant_parts"), "s_name")
        .limit(100)
    )
