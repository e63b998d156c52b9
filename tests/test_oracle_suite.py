"""The full declared-query suite vs DuckDB at sf0.001 (fast gate; the
driver runs the same comparison at sf0.01). Covers BOTH the driver-facing
registry (capped at 50 entries for the driver's CORRECTNESS window) and the
local-only extension registry whose entries are folded into the q_sx*
combos."""

import pytest

from go_pq_cdc_elasticsearch_spark.sql import EXT_REGISTRY, REGISTRY
from go_pq_cdc_elasticsearch_spark.testing_utils import compare, duckdb_con

SF = "/root/testdata/sf0.001"
ALL = {**REGISTRY, **EXT_REGISTRY}


def test_driver_registry_fits_correctness_window():
    # the driver records only the first 50 alphabetical entries; every
    # driver-facing query must land inside that window
    assert len(REGISTRY) <= 50


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF)


@pytest.mark.parametrize("name", sorted(n for n, q in ALL.items() if q.oracle))
def test_query_matches_oracle(spark, con, name):
    q = ALL[name]
    problems = compare(q.spark(spark, SF), con, q.oracle)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize(
    "name", sorted(n for n, q in ALL.items() if q.oracle is None)
)
def test_rows_only_queries_run(spark, name):
    df = ALL[name].spark(spark, SF)
    assert df.collect() is not None
