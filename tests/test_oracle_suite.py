"""The full declared-query suite vs DuckDB at sf0.001 (fast gate; the
driver runs the same comparison at sf0.01)."""

import pytest

from go_pq_cdc_elasticsearch_spark.sql import REGISTRY
from go_pq_cdc_elasticsearch_spark.testing_utils import compare, duckdb_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF)


@pytest.mark.parametrize("name", sorted(n for n, q in REGISTRY.items() if q.oracle))
def test_query_matches_oracle(spark, con, name):
    q = REGISTRY[name]
    problems = compare(q.spark(spark, SF), con, q.oracle)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize(
    "name", sorted(n for n, q in REGISTRY.items() if q.oracle is None)
)
def test_rows_only_queries_run(spark, name):
    df = REGISTRY[name].spark(spark, SF)
    assert df.collect() is not None
