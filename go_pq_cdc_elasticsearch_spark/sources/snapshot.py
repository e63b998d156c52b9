"""Consistent-snapshot source (upstream U1 semantics).

The reference's upstream takes a consistent Postgres snapshot
(pg_export_snapshot), splits it into chunks (default 8000 rows,
README.md:224) and has workers claim/heartbeat/reclaim chunks
(README.md:225-227); modes: initial / never / snapshot_only.

Spark mapping: chunk claiming + heartbeats + reclaim == Spark's task
scheduler + retries, for free. What remains is a *partitioned* read:

- live Postgres: ``spark.read.jdbc`` with partitionColumn/lowerBound/
  upperBound/numPartitions (each partition = one chunk-range query);
- testdata/bench: parquet is already chunked by row-group; we surface the
  same knob by computing numPartitions from the configured chunk size so
  plans match cluster expectations.

``snapshot_only`` mode == a plain batch job over this source;
``initial`` == run this, record the stream start offset, then hand off to
the streaming pipeline (see streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.operators.chunks import chunk_count

DEFAULT_CHUNK_SIZE = 8000  # reference README.md:224


def snapshot_read(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> DataFrame:
    """Chunked snapshot read of a testdata table.

    Parquet scans already split by row-group/file; repartitioning to the
    chunk-derived width only when the scan is *narrower* keeps small tables
    single-partition while giving big tables the parallelism the reference's
    chunking provides. (At cluster scale, the JDBC variant below is the
    real path; this keeps plan shape comparable.)
    """
    df = load_table(spark, sf_dir, table)
    n = df.count()
    parts = max(1, chunk_count(n, chunk_size))
    if df.rdd.getNumPartitions() < parts:
        df = df.repartition(parts)
    return df


def snapshot_read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    **options: str,
) -> DataFrame:
    """Live-Postgres snapshot: partitioned JDBC read where each partition is
    one chunk range (upstream chunk == Spark input partition). Not exercised
    in tests (no database in the container); the range arithmetic is shared
    with snapshot_read and unit-tested.
    """
    num_partitions = max(1, chunk_count(upper_bound - lower_bound + 1, chunk_size))
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
