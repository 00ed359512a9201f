"""SQL-surface completeness: boolean/filtered aggregates and
error-safe (TRY) arithmetic — the last small dialect corners a shelf
user's DuckDB SQL steps would exercise (reference delegates all SQL,
src/shelf/tables.py:155-181).

Both are map-side-trivial: one partial+final agg, and a pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .num import _round_ieee, _sql_round_ieee
from .registry import query


@query(
    "agg_boolean",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
           bool_and(l_quantity > 0)     AS all_positive_qty,
           bool_or(l_discount > 0.09)   AS any_deep_discount
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean & filtered aggregates (count_if / bool_and / bool_or) —
    integer/boolean-exact, one partial+final hash agg."""
    li = spark.table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN (l_quantity - l_quantity) = 0 THEN NULL
                ELSE l_extendedprice / (l_quantity - l_quantity) END AS safe_div_zero,
           {up} AS unit_price,
           TRY_CAST(l_returnflag AS INTEGER)                          AS flag_as_int,
           coalesce(TRY_CAST(l_returnflag AS INTEGER), -1)            AS flag_or_default
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 1000
    """.format(up=_sql_round_ieee("l_extendedprice / nullif(l_quantity, 0)", 2)),
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface: try_divide (NULL on zero), nullif
    guards, try_cast (NULL on malformed), coalesce defaults — a pure
    projection that never aborts a 100 TB job on one bad row (ANSI-mode
    Spark would; the try_* family is the sanctioned escape)."""
    li = spark.table("lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.try_divide(
                F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
            ).alias("safe_div_zero"),
            _round_ieee(
                F.col("l_extendedprice") / F.nullif(F.col("l_quantity"), F.lit(0)), 2
            ).alias("unit_price"),
            F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
            F.coalesce(F.col("l_returnflag").try_cast("int"), F.lit(-1)).alias(
                "flag_or_default"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    )
