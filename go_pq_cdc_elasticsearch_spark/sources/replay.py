"""File-replay change-stream source (R1/U2 stand-in).

The reference consumes decoded WAL messages one callback at a time
(connector.go:129-172); offsets advance on ack. The engine's replayable
equivalent is a Structured Streaming file source over the events table:
checkpoint commits == LSN acks, maxFilesPerTrigger == micro-batch sizing.

``stage_event_files`` splits the single events.parquet into N seq-ordered
files (written oldest-first so the file source's modification-time ordering
replays them in seq order) — giving tests a genuine multi-micro-batch
stream without touching the read-only testdata.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table

# ts is NTZ end-to-end: staging normalizes whatever load_table yields to
# wall time, and the stream reads it back as NTZ. Declaring plain
# `timestamp` here would reinterpret the stored naive values as UTC
# instants, shifting every window/session boundary downstream by the
# session-timezone offset (measured: q_t1/q_t2 oracle mismatches under
# America/New_York; correct under UTC only by coincidence).
EVENTS_LONG_TS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def stage_event_files(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> list[str]:
    """Write the events table as n_files seq-range parquet files under
    out_dir, mtime-ordered by seq so replay order == LSN order."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    # ONE job: range-partition by seq — part-file ordinal == seq range order
    # (range boundaries are sampled, which is fine: the merge is
    # seq-resolved, so replay correctness never depends on the split points)
    tmp = os.path.join(out_dir, "_stage")
    events.repartitionByRange(n_files, F.col("event_id")).write.mode(
        "overwrite"
    ).parquet(tmp)
    parts = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    paths = []
    for i, f in enumerate(parts):
        dst = os.path.join(out_dir, f"events_{i:04d}.parquet")
        shutil.move(os.path.join(tmp, f), dst)
        # file source orders by modification time; make it strictly increasing
        t = time.time() + i * 2
        os.utime(dst, (t, t))
        paths.append(dst)
    shutil.rmtree(tmp)
    return paths


def read_event_stream(
    spark: SparkSession,
    staged_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming DataFrame over staged event files, one file per micro-batch
    by default (multi-batch replay == multiple flush/ack cycles)."""
    return (
        spark.readStream.schema(EVENTS_LONG_TS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("latestFirst", "false")
        .parquet(staged_dir)
    )
