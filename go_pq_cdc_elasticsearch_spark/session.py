"""SparkSession factory.

Local mode is a single JVM; the same settings are chosen so the plans they
produce (AQE, broadcast thresholds, shuffle partitioning) are the ones we
would want on a large cluster: AQE coalesces / re-plans at runtime, shuffle
partitions sized to cores locally (on a cluster this should be ~2-3x total
cores or left to AQE), UTC session timezone so results are comparable with
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_count() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "go-pq-cdc-elasticsearch-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    These mirror what a production deployment would set cluster-wide:
    - AQE on (runtime shuffle-partition coalescing, skew-join splitting)
    - shuffle partitions ~ cores for local mode
    - Arrow for any pandas exchange (vectorized UDF path)
    - UTC timezone (oracle comparability; also the only sane cluster default)
    """
    n = cpus or cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # UTC default for oracle comparability; SPARK_GRAFT_TZ overrides so
        # the verify sweep can probe non-UTC/DST sensitivity (the driver's
        # session zone is not guaranteed — results must not depend on it)
        .config(
            "spark.sql.session.timeZone",
            os.environ.get("SPARK_GRAFT_TZ", "UTC"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no ns
        # timestamp type — read as long and convert in the catalog (floor to
        # micros, matching DuckDB's read-time ns->us truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # zstd for everything this engine WRITES (view buckets, staging,
        # bucketed/z-ordered tables): smaller than snappy at similar read
        # speed (optimization guide §6) — at 100 TB the view store and its
        # per-merge bucket rewrites are I/O-bound, so bytes written is the
        # cost. Read paths are unaffected (codec is per-file metadata).
        # Overridable for A/B via env.
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd"),
        )
        # PySpark 4's DataFrame-debugging wrapper adds, to EVERY DataFrame
        # API call, a conf.get py4j round trip + a PySparkCurrentOrigin.set
        # round trip + a Python stack walk — pure error-message enrichment
        # (call-site attribution in error contexts), no semantic effect.
        # Measured r13: the 42-part EXT fold's driver-side construction
        # cycle is 8.5 s with it on vs 6.1 s off (cProfile: the cost is
        # py4j socket waits + importlib/inspect churn, both per-call).
        # This engine submits thousands of fine-grained Column/DataFrame
        # calls per fold, so the per-call tax is a measured ~28% of plan
        # construction — on any deployment, not just this box.
        # Overridable for debugging sessions via env.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUGGING", "false"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
