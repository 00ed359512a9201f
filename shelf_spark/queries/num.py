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
    """Exact (order-independent) sum of a ≤8-decimal double column.

    Rounding happens in the DECIMAL domain — exact half-up on the true
    decimal value — and only then casts to double. Rounding after the
    double cast is the trap: Spark rounds a double via its shortest
    decimal repr while DuckDB rounds the binary value, so a sum landing
    exactly on a half-boundary (…x50 at nd+1 digits) rounds differently
    per engine even though the doubles are identical.
    """
    return F.round(F.sum(col.cast(DEC)), nd).cast("double")


def dsum_win(col: Column, window, nd: int = 2) -> Column:
    """Windowed exact sum (DuckDB's segment-tree window aggs reorder too)."""
    return F.round(F.sum(col.cast(DEC)).over(window), nd).cast("double")


def _round_ieee(x: Column, nd: int) -> Column:
    """Half-up rounding as pure IEEE arithmetic: floor(x·10^nd + 0.5)/10^nd.

    Both engines execute the same three float ops on the same input
    double, so the result is bitwise identical by construction — immune
    to the engines' differing double→decimal conversion semantics that
    make native round() diverge exactly on half-boundaries. (Halves round
    toward +inf for negatives; fine, because the oracle twin uses the
    identical formula.)
    """
    scale = float(10**nd)
    return F.floor(x * scale + F.lit(0.5)) / scale


def davg(col: Column, nd: int = 6) -> Column:
    """Deterministic average: exact decimal sum, one IEEE division, then
    IEEE-only rounding (see :func:`_round_ieee` — a 3-decimal sum divided
    by a 2^k count terminates within 8 decimals and CAN land exactly on a
    6-decimal half-boundary, where native round() is engine-specific)."""
    return _round_ieee(F.sum(col.cast(DEC)).cast("double") / F.count(col), nd)


def davg_win(col: Column, window, nd: int = 6) -> Column:
    return _round_ieee(
        F.sum(col.cast(DEC)).over(window).cast("double")
        / F.count(col).over(window),
        nd,
    )


def sql_dsum(expr: str, nd: int = 2) -> str:
    """DuckDB twin of :func:`dsum` (decimal-domain round, then cast)."""
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(30,8))), {nd}) AS DOUBLE)"


def sql_dsum_over(expr: str, over: str, nd: int = 2) -> str:
    return (
        f"CAST(round(sum(CAST({expr} AS DECIMAL(30,8))) OVER {over}, {nd}) AS DOUBLE)"
    )


def _sql_round_ieee(x: str, nd: int) -> str:
    scale = float(10**nd)
    return f"(floor(({x}) * {scale} + 0.5) / {scale})"


def sql_davg(expr: str, nd: int = 6) -> str:
    return _sql_round_ieee(
        f"CAST(sum(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE) / count({expr})", nd
    )


def sql_davg_over(expr: str, over: str, nd: int = 6) -> str:
    return _sql_round_ieee(
        f"CAST(sum(CAST({expr} AS DECIMAL(30,8))) OVER {over} AS DOUBLE)"
        f" / count({expr}) OVER {over}",
        nd,
    )
