"""Materialized keyed view writer — the engine's MERGE sink.

The reference's ES index *is* a materialized last-write-wins view: idempotent
keyed upserts/deletes (bulk/bulk.go:208-245) after in-batch dedup
(bulk/bulk.go:141-157), acked only after a successful flush
(bulk/bulk.go:271-276) => at-least-once delivery with an idempotent apply,
i.e. exactly-once on the view.

Engine design (no Delta in this container, so MERGE is emulated):
- state lives in a parquet directory, compacted to ONE row per key but
  *including* delete tombstones (so a replayed/out-of-order older upsert can
  never resurrect a deleted key — seq decides, not arrival time);
- merge(batch): union(state, dedup(batch)) -> keep max-seq row per key ->
  atomic directory swap;
- the readable view filters tombstones out.

At cluster scale the identical logic is one Delta/Iceberg MERGE statement;
the swap is the format-free equivalent. Cost per batch: one shuffle on the
key over (state + batch) — the same asymptotic cost as MERGE-on-read
compaction.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.operators.cdc import cdc_dedup


class MaterializedView:
    """A keyed last-write-wins table backed by a parquet directory."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str] = ("user_id",),
        seq_col: str = "event_id",
        op_col: str = "event_type",
        delete_op: str = "delete",
    ):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.seq_col = seq_col
        self.op_col = op_col
        self.delete_op = delete_op

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS"))

    def state(self) -> DataFrame | None:
        """Current compacted state INCLUDING tombstones, or None if empty."""
        return self.spark.read.parquet(self.path) if self.exists() else None

    def read(self) -> DataFrame:
        """The user-visible view: tombstones filtered out."""
        state = self.state()
        if state is None:
            raise FileNotFoundError(f"materialized view not initialized: {self.path}")
        return state.filter(F.col(self.op_col) != F.lit(self.delete_op))

    def merge_batch(self, batch: DataFrame) -> None:
        """Apply one micro-batch: in-batch dedup FIRST (the reference dedups
        before issuing the bulk request — order matters, bulk/bulk.go:141
        happens before :297), then seq-resolved merge with existing state,
        then atomic swap."""
        compact = cdc_dedup(batch, keys=self.keys, seq_col=self.seq_col)
        state = self.state()
        # allowMissingColumns: the reference's payloads are schemaless
        # (map[string]any); a batch may add columns (schema drift) — old
        # state rows get NULLs, dropped columns stay NULL for new rows
        merged = (
            state.unionByName(compact, allowMissingColumns=True)
            if state is not None
            else compact
        )
        new_state = cdc_dedup(merged, keys=self.keys, seq_col=self.seq_col)

        tmp = tempfile.mkdtemp(prefix="mv_", dir=os.path.dirname(self.path) or ".")
        out = os.path.join(tmp, "data")
        new_state.write.mode("overwrite").parquet(out)
        old = self.path + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(out, self.path)
        if os.path.exists(old):
            shutil.rmtree(old)
        shutil.rmtree(tmp, ignore_errors=True)

    def vacuum(self, watermark_seq: int) -> None:
        """Drop tombstones whose seq is <= watermark_seq (retention).

        Tombstones exist so stale replays can't resurrect deleted keys; once
        the source can no longer re-deliver below watermark_seq (the
        checkpoint/ack frontier), tombstones below it are dead weight. The
        Delta equivalent is VACUUM after retention."""
        state = self.state()
        if state is None:
            return
        from pyspark.sql import functions as F

        keep = state.filter(
            (F.col(self.op_col) != F.lit(self.delete_op))
            | (F.col(self.seq_col) > F.lit(watermark_seq))
        )
        tmp = tempfile.mkdtemp(prefix="mv_vac_", dir=os.path.dirname(self.path) or ".")
        out = os.path.join(tmp, "data")
        keep.write.mode("overwrite").parquet(out)
        old = self.path + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(self.path, old)
        os.rename(out, self.path)
        shutil.rmtree(old)
        shutil.rmtree(tmp, ignore_errors=True)

    def foreach_batch_writer(self):
        """Adapter for ``writeStream.foreachBatch`` — the Spark analog of the
        reference's flush-then-ack loop: when this returns, the micro-batch
        is durably merged and the checkpoint (offset/LSN) commits."""

        def write(batch_df: DataFrame, epoch_id: int) -> None:  # noqa: ARG001
            self.merge_batch(batch_df)

        return write
