"""Bucketed co-located join: the no-shuffle contract, asserted on plans."""

from __future__ import annotations

import pytest

from shelf_spark.data import load_table
from shelf_spark.optimize import is_shuffle_free_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_keys=["l_orderkey"])
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders",
        ["l_orderkey"],
        8,
        sort_keys=["l_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # Force the join to be non-broadcast so the exchange question is real.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert is_shuffle_free_join(spark, "b_lineitem", "b_orders", ["l_orderkey"])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark):
    from shelf_spark.optimize import salted_join

    li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed("l_orderkey", "k")
    orders = load_table(spark, SF_DIR, "orders").withColumnRenamed("o_orderkey", "k")
    plain = li.join(orders, "k").count()
    salted = salted_join(li, orders, "k", salt=8).count()
    assert salted == plain


def test_bucketed_join_correct(spark, bucketed):
    joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    want = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert joined.count() == want.count()
