"""Query-layer tests: registry integrity, smoke, and golden results at
sf0.001 (the driver's DuckDB-oracle harness is replicated in full by
tools/check_correctness.py; these are the fast always-run subset)."""

from __future__ import annotations

import duckdb
import pytest

from conftest import SF_SMALL

from shelf_spark.data import TABLES, table_path
from shelf_spark.queries import ORACLES, QUERIES


def test_registry_integrity():
    assert QUERIES, "registry must not be empty"
    for name in ORACLES:
        assert name in QUERIES, f"oracle without query: {name}"
    # every query callable takes (spark, sf_dir)
    for fn in QUERIES.values():
        assert callable(fn)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_q1_golden_vs_duckdb(spark):
    """One full oracle comparison inline (the rest run via tools/)."""
    sdf = QUERIES["q1_pricing_summary"](spark, SF_SMALL)
    srows = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_SMALL, t)}')"
        )
    drows = sorted(tuple(r) for r in con.execute(ORACLES["q1_pricing_summary"]).fetchall())
    assert srows == drows


@pytest.mark.parametrize("name", ["join_semi", "window_rank", "events_asof_join"])
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0


def test_hash_sample_invariant_to_partitioning(spark):
    """The kept-row set of content-hash sampling must depend only on row
    content — never on partition layout. (df.sample would fail this.)"""
    from shelf_spark.data import register_views

    register_views(spark, SF_SMALL)
    base = QUERIES["sample_bernoulli_hash"](spark, SF_SMALL)
    ids = sorted(r.doc_id for r in base.select("doc_id").collect())
    assert ids, "sample should be non-empty"

    d = spark.table("documents").repartition(13, "lang")
    d.createOrReplaceTempView("documents")
    try:
        reshuffled = QUERIES["sample_bernoulli_hash"](spark, SF_SMALL)
        ids2 = sorted(r.doc_id for r in reshuffled.select("doc_id").collect())
    finally:
        register_views(spark, SF_SMALL, force=True)
    assert ids == ids2


def test_scan_pushdown_plan(spark):
    """Filter + projection must reach the parquet scan."""
    df = QUERIES["scan_project_filter"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # pruned read schema: only the 5 referenced columns, not all 11
    assert "l_comment" not in plan
