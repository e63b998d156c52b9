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


def _event_id_bounds(spark: SparkSession, sf_dir: str, events) -> tuple:
    """(min, max) of event_id — from parquet row-group FOOTER statistics
    when every row group carries them (a few KB of metadata, no Spark
    job), else the agg fallback. The bare agg was a full extra scan of
    the events table per staging call, paid by every e2e test and bench
    run — the same cost class parquet_feed_empty was de-jobbed for
    (review r8). Footer min/max ignore NULLs exactly like the agg."""
    try:
        import pyarrow.parquet as pq

        from go_pq_cdc_elasticsearch_spark.catalog import table_path
        from go_pq_cdc_elasticsearch_spark.sources.snapshot import (
            _parquet_data_files,
        )

        lo = hi = None
        for f in _parquet_data_files(table_path(sf_dir, "events")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("event_id")
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(idx)
                if md.row_group(rg).num_rows == 0:
                    continue
                stats = col.statistics
                if stats is None or not stats.has_min_max:
                    raise LookupError("row group without event_id stats")
                if stats.min is not None:
                    lo = stats.min if lo is None else min(lo, stats.min)
                if stats.max is not None:
                    hi = stats.max if hi is None else max(hi, stats.max)
        return lo, hi
    except Exception:  # noqa: BLE001 — stats absent/odd layout: one agg job
        row = events.agg(F.min("event_id"), F.max("event_id")).first()
        return row[0], row[1]


def stage_event_files(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> list[str]:
    """Write the events table as n_files seq-range parquet files under
    out_dir, mtime-ordered by seq so replay order == LSN order.

    Split points are EXPLICIT arithmetic on the seq range (not sampled):
    repartitionByRange samples its boundaries, so two sessions could cut
    micro-batches differently — harmless for seq-resolved merges, but any
    query whose *stateful streaming* result is checked against an oracle
    (session windows, watermarks) must see identical batch boundaries in
    every environment."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    lo, hi = _event_id_bounds(spark, sf_dir, events)
    span = (hi - lo + 1) if hi is not None else 1
    # the offset is cast to double BEFORE the multiply: (event_id-lo) *
    # n_files as a long multiply overflows under ANSI for snowflake-scale
    # id spans (~2^63/n_files — the id class that already forced
    # DECIMAL(38,0) elsewhere; ARITHMETIC_OVERFLOW proven live, review
    # r7). The result feeds a double division anyway, and IEEE double
    # arithmetic keeps the split points environment-identical.
    # NULL seq stays a NULL slice so stage_slices' fail-loud guard FIRES:
    # F.least skips NULL args, so the bare form silently staged a
    # NULL-event_id row into the LAST slice — replayed out of position
    # with no error, breaking "replay order == LSN order" and making
    # seq-resolved LWW nondeterministic for that key (review r8; the
    # guard below was written exactly for this and was unreachable). A
    # row without a replay position cannot be ordered — the pgoutput
    # stamp this column models is never NULL.
    slice_expr = F.when(
        F.col("event_id").isNotNull(),
        F.least(
            F.lit(n_files - 1),
            (
                (F.col("event_id") - F.lit(lo)).cast("double")
                * n_files
                / F.lit(float(span))
            ).cast("int"),
        ),
    )
    return stage_slices(
        events.withColumn("__f", slice_expr), out_dir, n_files=n_files
    )


def stage_slices(df, out_dir: str, n_files: int, slice_col: str = "__f") -> list[str]:
    """Write df as one parquet file per distinct ``slice_col`` value
    (0..n_files-1), mtime-ordered by slice — ONE Spark job: hash-partition
    on the slice column so each slice lands in a single task, write
    partitioned dirs, then move the single part file of each dir into
    place. Replay order == slice order."""
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    tmp = os.path.join(out_dir, "_stage")
    df.repartition(n_files, F.col(slice_col)).write.mode("overwrite").partitionBy(
        slice_col
    ).parquet(tmp)
    paths = []
    now = time.time()
    for i in range(n_files):
        d = os.path.join(tmp, f"{slice_col}={i}")
        if not os.path.isdir(d):
            continue
        parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
        if not parts:
            continue
        if len(parts) == 1:
            slice_dsts = [os.path.join(out_dir, f"events_{i:04d}.parquet")]
            shutil.move(os.path.join(d, parts[0]), slice_dsts[0])
        else:  # defensive: a slice split across files keeps its own order
            slice_dsts = []
            for j, f in enumerate(sorted(parts)):
                dst = os.path.join(out_dir, f"events_{i:04d}_{j}.parquet")
                shutil.move(os.path.join(d, f), dst)
                slice_dsts.append(dst)
        # file source orders by modification time; make it strictly
        # increasing across slices AND within a split slice — EVERY part
        # gets stamped, or parquet-write mtimes would replay split parts
        # before slice 0 and break replay order == LSN order
        for j, dst in enumerate(slice_dsts):
            t = now + i * 2 + j * 0.001
            os.utime(dst, (t, t))
        paths.extend(slice_dsts)
    # any partition dir outside 0..n_files-1 means rows the harvest loop
    # would silently DELETE with the tmp dir — a NULL slice value (a
    # when() without otherwise()) lands in __HIVE_DEFAULT_PARTITION__ and
    # the replay feed would just be missing events, diverging from the
    # oracle with no error (review r7). Fail loudly instead.
    harvested = {f"{slice_col}={i}" for i in range(n_files)}
    stray = [
        d
        for d in os.listdir(tmp)
        if d.startswith(f"{slice_col}=")
        and d not in harvested
        and any(f.endswith(".parquet") for f in os.listdir(os.path.join(tmp, d)))
    ]
    if stray:
        raise ValueError(
            f"stage_slices: rows landed outside slices 0..{n_files - 1} "
            f"(NULL or out-of-range {slice_col}): {sorted(stray)}"
        )
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
