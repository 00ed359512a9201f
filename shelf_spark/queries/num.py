"""Cross-engine-deterministic numeric aggregation helpers.

Floating-point sums are order-dependent, and Spark (partial+final hash agg,
arbitrary partition order) and DuckDB (its own order) will differ in the
last ulp — which flips ``round()`` at half boundaries and breaks the
driver's value-hash. The fix: aggregate in DECIMAL (exact, order-
independent), cast back to double, and round on a grid the *true* value
lies on (input data is 2-decimal money / small-decimal rates, so sums are
exact at ≤8 decimals). Division by a count is a single IEEE op on
identical inputs → identical outputs.

These helpers cost a decimal aggregation instead of a double one — at
100 TB that's still a partial+final hash agg with map-side combine; the
per-row cost is marginally higher but the shuffle shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal carrier type: 8-decimal scale covers products of 2dp money
#: columns (2dp × 2dp × 2dp = 6dp exact), 22 integer digits of headroom.
DEC = "decimal(30,8)"


def dsum(col: Column, nd: int = 2) -> Column:
    """Exact (order-independent) sum of a ≤8-decimal double column."""
    return F.round(F.sum(col.cast(DEC)).cast("double"), nd)


def dsum_win(col: Column, window, nd: int = 2) -> Column:
    """Windowed exact sum (DuckDB's segment-tree window aggs reorder too)."""
    return F.round(F.sum(col.cast(DEC)).over(window).cast("double"), nd)


def davg(col: Column, nd: int = 6) -> Column:
    """Deterministic average: exact decimal sum, one IEEE division, round.

    Round at 6dp: the true mean is (exact k-decimal sum)/n; for n with only
    2/5 factors the quotient terminates well inside 6 decimals for this
    data, otherwise it's non-terminating and nowhere near a half-boundary.
    """
    return F.round(
        F.sum(col.cast(DEC)).cast("double") / F.count(col), nd
    )


def davg_win(col: Column, window, nd: int = 6) -> Column:
    return F.round(
        F.sum(col.cast(DEC)).over(window).cast("double")
        / F.count(col).over(window),
        nd,
    )


def sql_dsum(expr: str, nd: int = 2) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"round(CAST(sum(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE), {nd})"


def sql_dsum_over(expr: str, over: str, nd: int = 2) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(30,8))) OVER {over} AS DOUBLE), {nd})"
    )


def sql_davg(expr: str, nd: int = 6) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE)"
        f" / count({expr}), {nd})"
    )


def sql_davg_over(expr: str, over: str, nd: int = 6) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(30,8))) OVER {over} AS DOUBLE)"
        f" / count({expr}) OVER {over}, {nd})"
    )
