"""Edge pins for the r10-continuation helpers (time/null corpus fixes).

Each test pins the exact cross-engine contract the ten-corpus gate
relies on, at the unit level, so a refactor cannot silently reopen the
class: floor-to-seconds at negative epochs and huge magnitudes, the
sanity-window boundaries, and the truncation bug the helper replaces.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from shelf_spark.queries.num import (
    TS_SANE_MAX,
    TS_SANE_MIN,
    TS_STREAM_SANE_MIN,
    epoch_seconds_floor,
    sane_ts,
    sql_sane_ts,
    stream_sane_ts,
)


def _one(spark, ts, expr):
    df = spark.createDataFrame([(ts,)], "ts timestamp")
    return df.select(expr.alias("v")).first()["v"]


def test_epoch_seconds_floor_negative_fraction(spark):
    """One microsecond BEFORE the epoch floors to -1 — the exact case
    where Spark's unix_timestamp truncates to 0 and diverged from the
    oracle's floor(epoch()) (r10 time corpus, as-of staleness)."""
    t = dt.datetime(1969, 12, 31, 23, 59, 59, 999999)
    assert _one(spark, t, epoch_seconds_floor(F.col("ts"))) == -1
    # and the buggy path it replaces really does truncate:
    assert _one(spark, t, F.unix_timestamp("ts")) == 0


def test_epoch_seconds_floor_matches_on_positive_and_exact():
    """Positive instants and exact seconds: helper == unix_timestamp."""
    from shelf_spark.session import get_spark

    spark = get_spark("edges")
    cases = [
        dt.datetime(1970, 1, 1, 0, 0, 0),
        dt.datetime(2024, 6, 15, 12, 34, 56, 789000),
        dt.datetime(1969, 7, 20, 20, 17, 40),  # negative, no fraction
    ]
    for t in cases:
        got = _one(spark, t, epoch_seconds_floor(F.col("ts")))
        ut = _one(spark, t, F.unix_timestamp("ts"))
        assert got == ut, (t, got, ut)


def test_epoch_seconds_floor_exact_at_year_9999(spark):
    """Magnitude safety: micros for year 9999 exceed 2^53, so a double
    roundtrip would lose whole seconds — the decimal path must be
    exact. 9999-12-31T23:59:59 = 253402300799 s from the epoch."""
    t = dt.datetime(9999, 12, 31, 23, 59, 59, 999999)
    assert _one(spark, t, epoch_seconds_floor(F.col("ts"))) == 253402300799


def test_sane_ts_boundaries(spark):
    rows = [
        (dt.datetime(1899, 12, 31, 23, 59, 59), False),
        (dt.datetime(1900, 1, 1, 0, 0, 0), True),  # closed lower bound
        (dt.datetime(2024, 1, 1), True),
        (dt.datetime(2199, 12, 31, 23, 59, 59), True),
        (dt.datetime(2200, 1, 1, 0, 0, 0), False),  # open upper bound
        (dt.datetime(9999, 12, 31), False),
    ]
    for t, want in rows:
        assert _one(spark, t, sane_ts(F.col("ts"))) is want, t


def test_stream_sane_floor_is_tighter(spark):
    """Watermarked ops exclude pre-1971 (Spark's initial watermark is
    epoch zero — pre-1970 rows are born late); batch sanity keeps them."""
    t = dt.datetime(1969, 6, 1)
    assert _one(spark, t, sane_ts(F.col("ts"))) is True
    assert _one(spark, t, stream_sane_ts(F.col("ts"))) is False
    assert dt.datetime.fromisoformat(TS_STREAM_SANE_MIN) > dt.datetime(
        1970, 1, 1
    )


def test_sql_sane_ts_matches_spark_predicate(spark):
    """The DuckDB twin draws the same boundary on the same instants."""
    import duckdb

    con = duckdb.connect()
    for t in (
        dt.datetime(1899, 12, 31),
        dt.datetime(1900, 1, 1),
        dt.datetime(2199, 12, 31, 23, 59, 59),
        dt.datetime(2200, 1, 1),
    ):
        duck = con.execute(
            f"SELECT {sql_sane_ts('ts')} FROM (SELECT TIMESTAMP '{t}' AS ts)"
        ).fetchone()[0]
        assert duck is _one(spark, t, sane_ts(F.col("ts"))), t
    assert TS_SANE_MIN == "1900-01-01" and TS_SANE_MAX == "2200-01-01"
