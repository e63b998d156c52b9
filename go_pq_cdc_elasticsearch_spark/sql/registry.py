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

# Extension queries kept OUT of the driver-facing registry. The driver's
# CORRECTNESS artifact records only the first 50 registry entries
# (alphabetical), so the driver set is budgeted to exactly the SURVEY §2
# qids plus a few folded extension entries; everything else lives here,
# still oracle-checked locally (tests/test_oracle_suite.py, tools/check.py)
# and value-folded into the q_sx* combo entries the driver does record.
EXT_REGISTRY: dict[str, Query] = {}


def _register(target: dict[str, Query], name, oracle, doc):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY or name in EXT_REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        target[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a driver-facing declared query."""
    return _register(REGISTRY, name, oracle, doc)


def ext_query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a local-only extension query."""
    return _register(EXT_REGISTRY, name, oracle, doc)


_WORK_DIRS: list[str] = []


def query_work_dir(prefix: str) -> str:
    """mkdtemp whose removal is deferred to interpreter exit (review r6):
    several queries return LAZY DataFrames over files written under their
    work dir (materialized-view buckets, staged WAL segments), so inline
    cleanup would delete the data before the caller consumes it — but
    never cleaning up grew /tmp by a view+checkpoint per invocation per
    query across bench/gate/test runs. One atexit hook sweeps every dir
    created through here."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    if not _WORK_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(x, ignore_errors=True) for x in _WORK_DIRS]
        )
    _WORK_DIRS.append(d)
    return d
