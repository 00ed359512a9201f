"""Property tests for the integer-grid exact-aggregation tier (num.py).

The tier underpins ~30 oracle-checked queries, so pin its two contracts:

1. EXACTNESS: dsum_i of fixed-point doubles equals the exact Fraction
   arithmetic answer (no drift from the IEEE pre-scaling).
2. ORDER-INDEPENDENCE: the result is identical under any partitioning /
   row order — the property FP sums lack and the whole reason the tier
   exists (partial+final hash aggregation sums in arbitrary order).
"""

from __future__ import annotations

from fractions import Fraction

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from shelf_spark.queries.num import davg_i, dsum_i

# 2dp fixed-point money values (the dominant call-site shape), including
# negatives (acctbal) and zero.
cents = st.integers(min_value=-10_000_00, max_value=10_000_00)


@st.composite
def money_rows(draw):
    vals = draw(st.lists(cents, min_size=1, max_size=60))
    return [v / 100.0 for v in vals]


@given(money_rows())
@settings(max_examples=12, deadline=None)
def test_dsum_i_exact_and_partition_invariant(spark, xs):
    exact = sum(Fraction(round(x * 100)) for x in xs) / 100
    rows = [(i, x) for i, x in enumerate(xs)]
    for n_parts in (1, 3, 7):
        df = spark.createDataFrame(rows, "id long, x double").repartition(n_parts)
        got = df.agg(dsum_i(F.col("x"), 2).alias("s")).collect()[0]["s"]
        assert got == pytest.approx(float(exact), abs=0), (
            f"n_parts={n_parts}: {got} != {float(exact)}"
        )


@given(money_rows())
@settings(max_examples=8, deadline=None)
def test_davg_i_partition_invariant(spark, xs):
    rows = [(i, x) for i, x in enumerate(xs)]
    results = set()
    for n_parts in (1, 4):
        df = spark.createDataFrame(rows, "id long, x double").repartition(n_parts)
        got = df.agg(davg_i(F.col("x"), 2).alias("a")).collect()[0]["a"]
        results.add(got)
    assert len(results) == 1, f"avg differs across partitionings: {results}"


def test_dsum_i_product_grid(spark):
    """4dp products of 2dp factors (the revenue shape) stay exact."""
    rows = [(i, p / 100.0, d / 100.0) for i, (p, d) in enumerate(
        [(104997_88, 10), (901_82, 0), (55_55, 5), (12345_67, 9)]
    )]
    df = spark.createDataFrame(rows, "id long, price double, disc double")
    rev = F.col("price") * (1 - F.col("disc"))
    got = df.agg(dsum_i(rev, 4).alias("s")).collect()[0]["s"]
    exact = sum(
        Fraction(p, 100) * (1 - Fraction(d, 100))
        for p, d in [(104997_88, 10), (901_82, 0), (55_55, 5), (12345_67, 9)]
    )
    assert got == pytest.approx(float(exact), abs=0)
