"""Tolerance checks for the approximate aggregates. Since round 4 both
queries are oracle-checked as BOUNDED claims (the query emits booleans the
oracle's TRUE must hash-match — see q_s10_approx_distinct /
q_s26_approx_percentile); these tests assert the bounds locally and pin the
output contract the oracles rely on."""

from go_pq_cdc_elasticsearch_spark.sql import EXT_REGISTRY, REGISTRY

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_rel_err(spark):
    exact = REGISTRY["q_s10_count_distinct"].spark(spark, SF).collect()[0]["n"]
    row = EXT_REGISTRY["q_s10_approx_distinct"].spark(spark, SF).collect()[0]
    assert row["n_exact"] == exact
    assert row["within_3sigma"] is True


def test_approx_percentile_rank_bound(spark):
    row = EXT_REGISTRY["q_s26_approx_percentile"].spark(spark, SF).collect()[0]
    assert row["rank_ok_p50"] is True and row["rank_ok_p95"] is True
    # and the sketch VALUES stay within a loose value tolerance of exact
    exact = EXT_REGISTRY["q_s26_percentile"].spark(spark, SF).collect()[0]
    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.catalog import load_table

    approx = (
        load_table(spark, SF, "orders")
        .agg(
            F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50"),
            F.percentile_approx("o_totalprice", F.lit(0.95), F.lit(10000)).alias("p95"),
        )
        .collect()[0]
    )
    for col in ("p50", "p95"):
        assert abs(approx[col] - exact[col]) / max(abs(exact[col]), 1e-9) <= 0.05
