"""Co-located (bucketed) joins: correctness + the zero-Exchange plan
contract that makes them the right fact-fact join shape at scale."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.operators.bucketed import (
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture
def tables(spark):
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"li_b_{suffix}", f"ord_b_{suffix}"
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus", "o_totalprice"
    )
    write_bucketed(li, lt, ["l_orderkey"], n_buckets=4)
    write_bucketed(orders, rt, ["l_orderkey"], n_buckets=4)
    yield lt, rt, li, orders
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucketed_join_no_exchange(spark, tables):
    lt, rt, *_ = tables
    df = bucketed_join(spark, lt, rt, ["l_orderkey"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # the whole point: shuffle happened at write
    assert "Sort" not in plan.replace("SortMergeJoin", "SMJ")  # sortBy amortized too


def test_bucketed_join_matches_plain_join(spark, tables):
    lt, rt, li, orders = tables
    got = sorted(
        (r["l_orderkey"], r["o_orderstatus"], float(r["l_quantity"]))
        for r in bucketed_join(spark, lt, rt, ["l_orderkey"]).collect()
    )
    want = sorted(
        (r["l_orderkey"], r["o_orderstatus"], float(r["l_quantity"]))
        for r in li.join(orders, "l_orderkey").collect()
    )
    assert got == want and len(got) > 0
