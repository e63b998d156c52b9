"""Query registry plumbing.

Each declared query is a (spark_fn, oracle_sql) pair:
- ``spark_fn(spark, sf_dir) -> DataFrame`` — the engine implementation;
- ``oracle`` — equivalent ANSI SQL DuckDB runs on the same parquet tables
  (driver pre-registers views region nation customer supplier part orders
  lineitem events documents embeddings), or None for non-SQL-expressible
  operators (driver then records a weaker rows-only check).

Column names must match between the two sides (the driver sorts columns by
name before hashing values) — alias everything, both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a declared query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
