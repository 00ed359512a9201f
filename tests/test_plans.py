"""Plan-shape regression tests: the scale properties SCALE.md claims,
pinned so a refactor can't silently regress them."""

from __future__ import annotations

from shelf_spark.plans import broadcast_join_count, codegen_ids, exchange_count, scans_of
from shelf_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_scan_project_filter_pushdown(spark):
    df = QUERIES["scan_project_filter"](spark, SF_DIR)
    scans = scans_of(df)
    assert len(scans) == 1
    s = scans[0]
    # predicates reach the scan …
    assert "l_shipdate" in s.pushed_filters
    assert "l_discount" in s.pushed_filters
    assert "l_returnflag" in s.pushed_filters
    # … and only referenced columns are read (6 of 11)
    for col in ("l_orderkey", "l_linenumber", "l_extendedprice"):
        assert col in s.read_schema
    assert "l_tax" not in s.read_schema
    assert "l_partkey" not in s.read_schema


def test_q5_joins_broadcast_with_single_agg_shuffle(spark):
    df = QUERIES["q5_local_supplier_volume"](spark, SF_DIR)
    # all 5 dimension joins broadcast; shuffles only for agg + final sort
    assert broadcast_join_count(df) == 5
    assert exchange_count(df) <= 2


def test_q1_single_shuffle_and_codegen(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    # partial+final agg: exactly one hash exchange (+ range for the sort)
    assert exchange_count(df) <= 2
    # the date predicate is pushed to the scan
    s = scans_of(df)[0]
    assert "l_shipdate" in s.pushed_filters
    # whole-stage codegen spans are only rendered on non-adaptive plans
    # (AQE's pre-execution explain shows the skeleton); toggle to inspect
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df2 = QUERIES["q1_pricing_summary"](spark, SF_DIR)
        assert len(codegen_ids(df2)) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_sessionize_single_user_shuffle(spark):
    df = QUERIES["events_sessionize"](spark, SF_DIR)
    # gaps-and-islands over one hash partition by user_id: window funcs and
    # final agg reuse that partitioning — exactly one shuffle.
    assert exchange_count(df) == 1
