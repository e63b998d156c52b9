"""End-to-end CDC streaming pipeline (reference §3.1 lifecycle, Spark-first).

Stages map 1:1 to the reference:
  readStream (R1 source; checkpoint == slot/LSN)
  -> transform (R2 envelope / R3 handler — declarative, Catalyst-planned)
  -> foreachBatch MERGE into the materialized view (R8 dedup + R9 apply)
  -> checkpoint commit (R12 ack) after the writer returns.

``trigger(availableNow=True)`` == the reference's snapshot_only synchronous
drain; a processing-time trigger == normal CDC mode; restart from the same
checkpoint dir == crash recovery (at-least-once redelivery made exactly-once
by the seq-resolved merge).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView
from go_pq_cdc_elasticsearch_spark.sources.replay import (
    read_event_stream,
    stage_event_files,
)


def run_cdc_stream(
    spark: SparkSession,
    staged_dir: str,
    view_path: str,
    checkpoint_dir: str,
    keys=("user_id",),
    seq_col: str = "event_id",
    op_col: str = "event_type",
    delete_op: str = "delete",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    processing_time: str = "1 second",
) -> MaterializedView:
    """Run the CDC stream until drained (available_now) or return the running
    query's view handle. Returns the MaterializedView."""
    view = MaterializedView(
        spark, view_path, keys=keys, seq_col=seq_col, op_col=op_col, delete_op=delete_op
    )
    stream = read_event_stream(spark, staged_dir, max_files_per_trigger)
    writer = (
        stream.writeStream.foreachBatch(view.foreach_batch_writer())
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.trigger(processingTime=processing_time).start()
    return view


def initial_load(
    spark: SparkSession,
    snapshot_df,
    staged_dir: str,
    view_path: str,
    checkpoint_dir: str,
    **kwargs,
) -> MaterializedView:
    """Reference ``initial`` mode (README.md:36-47; proven by
    integration_test/snapshot_test.go:25-193): take a consistent snapshot
    first, then start CDC from the captured point with no gap.

    Spark mapping: the snapshot batch is merged into the view directly
    (chunked batch read == U1), then the stream replays from its first
    offset — the seq-resolved merge makes the handoff gap-free even if the
    stream re-delivers rows the snapshot already covered (same at-least-once
    + idempotent-apply contract as recovery)."""
    view = MaterializedView(spark, view_path, **kwargs)
    view.merge_batch(snapshot_df)
    return run_cdc_stream(
        spark,
        staged_dir=staged_dir,
        view_path=view_path,
        checkpoint_dir=checkpoint_dir,
        **kwargs,
    )


def replay_events_to_view(
    spark: SparkSession, sf_dir: str, n_files: int = 4, **kwargs
) -> MaterializedView:
    """Convenience: stage the events table as a multi-file stream under a
    temp dir, replay it through the full pipeline, return the view."""
    work = tempfile.mkdtemp(prefix="cdc_stream_")
    staged = os.path.join(work, "staged")
    stage_event_files(spark, sf_dir, staged, n_files=n_files)
    return run_cdc_stream(
        spark,
        staged_dir=staged,
        view_path=os.path.join(work, "view"),
        checkpoint_dir=os.path.join(work, "checkpoint"),
        **kwargs,
    )
