"""Edge pins for the r11 surfaces: ε-bounded sketch assertions, the
exact-integer DuckDB epoch path, and the occupancy sub-blocking
inertness claim behind the embed_cosine_pairs replan.

Each pin is the unit-level contract the oracle gate now relies on, so
a refactor cannot silently reopen the class.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from shelf_spark.queries.num import sql_epoch_s
from shelf_spark.queries.sketches import _hll_within_tol
from shelf_spark.queries.vectors import CELL_OCCUPANCY, occupancy_blocked


def _eval_tol(spark, est, exact):
    df = spark.createDataFrame([(est, exact)], "est double, exact long")
    return df.select(
        _hll_within_tol(F.col("est"), F.col("exact")).alias("ok")
    ).first()["ok"]


@pytest.mark.parametrize(
    "est, exact, ok",
    [
        (None, 0, True),    # merge over zero sketches + nothing to count
        (None, 5, False),   # lost sketch must not pass as "close enough"
        (110.0, 100, True),  # exactly the 10% boundary
        (113.0, 100, False),
        (3.0, 1, True),     # absolute grace of 2 for tiny groups
        (4.0, 1, False),
        (0.0, 0, True),
    ],
)
def test_hll_within_tol_boundaries(spark, est, exact, ok):
    assert _eval_tol(spark, est, exact) is ok


def test_sql_epoch_s_exact_where_float_epoch_is_not():
    """The r10 ADVICE exposure, reproduced and closed: DuckDB epoch()
    is a DOUBLE whose resolution exceeds 1 µs past ~year 2255, so
    floor(epoch()) lands one second HIGH on a far-future fractional
    instant; the integer epoch_us path must floor exactly."""
    con = duckdb.connect()
    ts = "TIMESTAMP '9999-12-31 23:59:58.999999'"
    naive, exact = con.execute(
        f"SELECT CAST(floor(epoch({ts})) AS BIGINT), {sql_epoch_s(ts)}"
    ).fetchone()
    assert exact == 253402300798  # floor of ...58.999999
    assert naive == 253402300799  # the double-resolution bug


@pytest.mark.parametrize(
    "ts, want",
    [
        ("TIMESTAMP '1969-12-31 23:59:59.999999'", -1),  # floor, not truncate
        ("TIMESTAMP '1970-01-01 00:00:00'", 0),
        ("TIMESTAMP '1900-01-01 00:00:00.000001'", -2208988800),
    ],
)
def test_sql_epoch_s_floors_negative_epochs(ts, want):
    con = duckdb.connect()
    assert con.execute(f"SELECT {sql_epoch_s(ts)}").fetchone()[0] == want


def test_occupancy_subcell_inert_at_test_scale(spark):
    """The embed_cosine_pairs replan's output-equality claim: at every
    test scale each label cell holds ≤ CELL_OCCUPANCY vectors, so the
    sub-cell key is constant 0 and the blocked plan's output equals
    the unblocked r10 plan's bit-for-bit."""
    from shelf_spark.data import register_views
    from tests.conftest import SF_SMALL

    register_views(spark, SF_SMALL)
    v = spark.table("embeddings").select("vec_id", "label")
    max_cell = (
        v.groupBy("label").count().agg(F.max("count")).first()[0]
    )
    assert max_cell <= CELL_OCCUPANCY
    subs = (
        occupancy_blocked(v).select("sub").distinct().collect()
    )
    assert [r["sub"] for r in subs] == [0]
