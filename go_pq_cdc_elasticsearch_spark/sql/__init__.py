"""Declared-query registry (SURVEY.md §2.2).

Importing this package populates the registry with every implemented query:
CDC-core (Q-C*), relational surface (Q-S*), streaming equivalence (Q-T*),
and the LLM-pipeline extension (Q-L*).
"""

from go_pq_cdc_elasticsearch_spark.sql.registry import (
    EXT_REGISTRY,
    REGISTRY,
    Query,
    ext_query,
    query,
)

# Populate the registry (ext_combo last: it folds EXT_REGISTRY entries).
from go_pq_cdc_elasticsearch_spark.sql import cdc_queries  # noqa: F401,E402
from go_pq_cdc_elasticsearch_spark.sql import relational_queries  # noqa: F401,E402
from go_pq_cdc_elasticsearch_spark.sql import llm_queries  # noqa: F401,E402
from go_pq_cdc_elasticsearch_spark.sql import streaming_queries  # noqa: F401,E402
from go_pq_cdc_elasticsearch_spark.sql import coverage_queries  # noqa: F401,E402
from go_pq_cdc_elasticsearch_spark.sql import ext_combo  # noqa: F401,E402

__all__ = ["REGISTRY", "EXT_REGISTRY", "Query", "query", "ext_query"]
