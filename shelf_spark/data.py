"""Test-table loading & temp-view registration for the query layer.

Mirrors the reference's ad-hoc query path (``shelf db``): every Parquet
table in the lake is exposed as a temp view under a snake-case name
(reference ``src/shelf/__init__.py:373-379``). Here the "lake" is the
driver-generated star schema at ``/root/testdata/sf*``.

View registration is lazy metadata only (no scan), so re-registering per
query call is free; Catalyst prunes columns & pushes filters into the
Parquet scan from these views exactly as from ``spark.read.parquet``.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

#: All driver-generated tables (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_NS_COLS_CACHE: dict[str, tuple[str, ...]] = {}


def _utc_adjusted_timestamp_cols(path: str) -> tuple[str, ...]:
    """µs/ms timestamp columns flagged isAdjustedToUTC in the footer.

    Arrow surfaces the flag as a ``tz=`` annotation on the timestamp type.
    These must be pinned as TimestampType (session-tz'd) in a file-stream
    schema — pinning NTZ over a UTC-adjusted column trips Spark's
    vectorized-reader conversion check. Uncached (cheap footer read;
    streaming ingest dirs change over time).
    """
    probe = path
    if os.path.isdir(path):
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not parts:
            return ()
        probe = os.path.join(path, min(parts))  # deterministic pick
    arrow = pq.read_schema(probe)
    return tuple(
        f.name
        for f in arrow
        if str(f.type).startswith("timestamp[")
        and not str(f.type).startswith("timestamp[ns")
        and getattr(f.type, "tz", None) is not None
    )


def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet timestamp[ns] (Spark can't read natively).

    The cache is keyed by the PROBED FILE, not the directory: a streaming
    ingest dir keeps growing, and pinning a dir to its first-ever probe
    would mis-read later files with a different timestamp encoding. The
    probe file is picked deterministically (min of the part names); when
    new parts change that pick, the new file is probed fresh.
    """
    probe = path
    if os.path.isdir(path):  # Spark-written table dir: probe a part file
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not parts:
            # Empty ingest dir: files that land later (possibly
            # int64-nanos) must be re-probed on next call.
            return ()
        probe = os.path.join(path, min(parts))
    if probe not in _NS_COLS_CACHE:
        # Arrow reports both TIMESTAMP(NANOS) (INT64) and Spark's INT96 as
        # timestamp[ns]; only the INT64 form needs the nanosAsLong workaround
        # (Spark reads its own INT96 natively).
        arrow = pq.read_schema(probe)
        physical = {
            c.name: c.physical_type
            for rg_c in [pq.ParquetFile(probe).schema]
            for c in (rg_c.column(i) for i in range(len(rg_c)))
        }
        _NS_COLS_CACHE[probe] = tuple(
            f.name
            for f in arrow
            if str(f.type).startswith("timestamp[ns")
            and physical.get(f.name) == "INT64"
        )
    return _NS_COLS_CACHE[probe]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = table_path(sf_dir, name)
    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    # Parquet TIMESTAMP(NANOS) is unreadable by Spark's converter; read the
    # raw int64 nanos (legacy conf) and floor-convert to microseconds —
    # lossless here and matching DuckDB's ns→us presentation.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    cols = list(df.columns)  # preserve stored column order
    for c in ns_cols:
        # integer `div` — a double division would round at 1e18 magnitude
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df.select(*cols)


# Per-session registration cache: schema discovery (spark.read.parquet +
# pyarrow schema probe) costs ~0.1s/table on the driver; re-running it for
# all 10 tables on every query call dominated small-SF latency. Keyed by
# the session object's id — the driver passes the same session per run.
# Testdata is immutable, so cached DataFrames never go stale; switching
# sf_dir in one session re-registers (views are session-global names).
_REGISTERED: dict[int, str] = {}
_DF_CACHE: dict[tuple[int, str, str], DataFrame] = {}
_SESSIONS: dict[int, SparkSession] = {}  # strong refs: prevent id() reuse


def register_views(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> dict[str, DataFrame]:
    """Register every test table as a temp view; return name → DataFrame.

    ``force`` re-issues the ``createOrReplaceTempView`` calls even when
    this (session, sf_dir) pair is already registered — needed after a
    caller has replaced one of the views.
    """
    key = id(spark)
    _SESSIONS[key] = spark
    out: dict[str, DataFrame] = {}
    if not force and _REGISTERED.get(key) == sf_dir:
        for name in TABLES:
            out[name] = _DF_CACHE[(key, sf_dir, name)]
        return out
    tune(spark)
    for name in TABLES:
        ck = (key, sf_dir, name)
        if ck not in _DF_CACHE:
            _DF_CACHE[ck] = load_table(spark, sf_dir, name)
        df = _DF_CACHE[ck]
        df.createOrReplaceTempView(name)
        out[name] = df
    _REGISTERED[key] = sf_dir
    return out
