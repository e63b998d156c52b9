"""Tolerance checks for the approximate aggregates (driver-demoted to the
local extension registry: no DuckDB oracle can hash-match a sketch, so the
hard signal is a relative-error bound vs the exact variant)."""

from go_pq_cdc_elasticsearch_spark.sql import EXT_REGISTRY, REGISTRY

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_rel_err(spark):
    exact = REGISTRY["q_s10_count_distinct"].spark(spark, SF).collect()[0]["n"]
    approx = (
        EXT_REGISTRY["q_s10_approx_distinct"].spark(spark, SF).collect()[0]["n_approx"]
    )
    # rsd=0.02 configured; allow 3 sigma
    assert abs(approx - exact) / exact <= 0.06


def test_approx_percentile_within_tolerance(spark):
    exact = EXT_REGISTRY["q_s26_percentile"].spark(spark, SF).collect()[0]
    approx = EXT_REGISTRY["q_s26_approx_percentile"].spark(spark, SF).collect()[0]
    # GK sketch with accuracy 10000: rank error <= n/10000; translate to a
    # loose value tolerance via the exact spread
    for col in ("p50", "p95"):
        assert abs(approx[col] - exact[col]) / max(abs(exact[col]), 1e-9) <= 0.05
