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


def dsum_i(col: Column, din: int = 2) -> Column:
    """Exact sum of a fixed-point double column via an integer grid.

    ``floor(x·10^din + 0.5)`` lands on the exact scaled integer (the true
    value lies on the 10^-din grid and the double is within ulps of it, so
    the +0.5 offset cannot cross a boundary), as a LONG — pure IEEE ops,
    identical on both engines. The integers accumulate in DECIMAL(18,0)
    (unscaled-long representation; the sum buffer auto-widens to
    DECIMAL(28,0) ≈ 1e28 headroom — at 100 TB a single group of 6e11 rows
    of 1e5-sized money values scaled by 1e6 sums to ~6e24, still exact).
    The final cast→double is correctly rounded on both engines and the
    trailing division is one IEEE op on identical inputs.

    ~40% cheaper per column than :func:`dsum`: it avoids the per-row
    double→decimal cast (BigDecimal.valueOf → Double.toString in the JVM),
    which dominates the decimal tier's cost. Same determinism guarantee.

    CALLER CONTRACT: the input must be fixed-point data lying on the
    10^-din grid (money, rates, grid products). An off-grid value — a
    ratio, a vector norm, an already-averaged column — is silently
    quantized to din decimals with no error raised; for general ≤8dp
    doubles use :func:`dsum`'s DECIMAL(30,8) tier instead. Note the
    result is the UNROUNDED grid sum (up to din decimals); the old
    decimal tier presented 2dp — an intentional precision change,
    recorded in SCALE.md (both engines changed together, so parity is
    unaffected).
    """
    scale = float(10**din)
    s = F.sum(F.floor(col * scale + F.lit(0.5)).cast("decimal(18,0)"))
    return s.cast("double") / scale


def davg_i(col: Column, din: int = 2, nd: int = 6) -> Column:
    """Deterministic average on the integer grid (see :func:`dsum_i`).

    Shares the inner ``sum(decimal(18,0))`` aggregate with :func:`dsum_i`
    at the same ``din`` — Catalyst dedupes identical aggregate expressions,
    so ``dsum_i(c) + davg_i(c)`` costs one accumulator, not two.
    """
    scale = float(10**din)
    s = F.sum(F.floor(col * scale + F.lit(0.5)).cast("decimal(18,0)"))
    return _round_ieee(s.cast("double") / scale / F.count(col), nd)


def sql_dsum_i(expr: str, din: int = 2) -> str:
    """DuckDB twin of :func:`dsum_i` (same IEEE ops, DECIMAL accumulation)."""
    scale = float(10**din)
    return (
        f"(CAST(sum(CAST(floor(({expr}) * {scale} + 0.5) AS DECIMAL(18,0)))"
        f" AS DOUBLE) / {scale})"
    )


def sql_davg_i(expr: str, din: int = 2, nd: int = 6) -> str:
    scale = float(10**din)
    return _sql_round_ieee(
        f"CAST(sum(CAST(floor(({expr}) * {scale} + 0.5) AS DECIMAL(18,0)))"
        f" AS DOUBLE) / {scale} / count({expr})",
        nd,
    )


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


def dsum_win_i(col: Column, window, din: int = 2) -> Column:
    """Windowed integer-grid exact sum (see :func:`dsum_i`)."""
    scale = float(10**din)
    s = F.sum(F.floor(col * scale + F.lit(0.5)).cast("decimal(18,0)")).over(window)
    return s.cast("double") / scale


def davg_win_i(col: Column, window, din: int = 2, nd: int = 6) -> Column:
    scale = float(10**din)
    s = F.sum(F.floor(col * scale + F.lit(0.5)).cast("decimal(18,0)")).over(window)
    return _round_ieee(s.cast("double") / scale / F.count(col).over(window), nd)


def sql_dsum_over_i(expr: str, over: str, din: int = 2) -> str:
    scale = float(10**din)
    return (
        f"(CAST(sum(CAST(floor(({expr}) * {scale} + 0.5) AS DECIMAL(18,0)))"
        f" OVER {over} AS DOUBLE) / {scale})"
    )


def sql_davg_over_i(expr: str, over: str, din: int = 2, nd: int = 6) -> str:
    scale = float(10**din)
    return _sql_round_ieee(
        f"CAST(sum(CAST(floor(({expr}) * {scale} + 0.5) AS DECIMAL(18,0)))"
        f" OVER {over} AS DOUBLE) / {scale} / count({expr}) OVER {over}",
        nd,
    )


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
