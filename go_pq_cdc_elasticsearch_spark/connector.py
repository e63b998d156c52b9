"""Connector facade — lifecycle parity with the reference's public API.

Reference (connector.go:25-29): ``Connector`` exposes Start / WaitUntilReady
/ Close; construction wires config -> CDC source -> handler -> bulk sink
(NewConnector, connector.go:43-80). The engine mirrors that surface so a
reference user keeps their mental model:

    cfg = ConnectorConfig(
        staged_dir=...,            # change-feed location (file replay / live)
        view_path=...,             # materialized target ("the index")
        checkpoint_dir=...,        # slot/LSN analog
        table_index_mapping={...}, # R6 routing
        snapshot_mode="never"|"initial"|"snapshot_only",
    )
    c = Connector(spark, cfg, handler=None)   # None => simple handler preset
    c.start(); c.wait_until_ready(); ...; c.close()

Modes (connector.go:84-96): ``snapshot_only`` runs the batch backfill and
returns; ``initial`` backfills then streams; ``never`` streams only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView
from go_pq_cdc_elasticsearch_spark.sources.replay import read_event_stream


@dataclass
class ConnectorConfig:
    staged_dir: str
    view_path: str
    checkpoint_dir: str
    table_index_mapping: dict[str, str] = field(default_factory=dict)
    snapshot_mode: str = "never"  # never | initial | snapshot_only
    keys: tuple[str, ...] = ("user_id",)
    seq_col: str = "event_id"
    op_col: str = "event_type"
    delete_op: str = "delete"
    max_files_per_trigger: int = 1
    processing_time: str = "1 second"


class Connector:
    """Start/WaitUntilReady/Close over the streaming CDC pipeline."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: ConnectorConfig,
        snapshot_df: DataFrame | None = None,
        transform=None,
    ):
        self.spark = spark
        self.cfg = cfg
        self.snapshot_df = snapshot_df
        self.transform = transform  # optional DataFrame->DataFrame handler hook
        self.view = MaterializedView(
            spark,
            cfg.view_path,
            keys=cfg.keys,
            seq_col=cfg.seq_col,
            op_col=cfg.op_col,
            delete_op=cfg.delete_op,
        )
        self._query = None

    # -- lifecycle (reference connector.go:82-127) --------------------------

    def start(self, available_now: bool = False) -> "Connector":
        mode = self.cfg.snapshot_mode
        if mode in ("initial", "snapshot_only"):
            if self.snapshot_df is None:
                raise ValueError(f"snapshot_mode={mode} requires snapshot_df")
            # U1: chunked consistent snapshot == batch merge (sync, like the
            # reference's snapshot-only synchronous Start path)
            self.view.merge_batch(self.snapshot_df)
            if mode == "snapshot_only":
                return self
        stream = read_event_stream(
            self.spark, self.cfg.staged_dir, self.cfg.max_files_per_trigger
        )
        if self.transform is not None:
            stream = self.transform(stream)
        writer = (
            stream.writeStream.foreachBatch(self.view.foreach_batch_writer())
            .option("checkpointLocation", self.cfg.checkpoint_dir)
        )
        if available_now:
            self._query = writer.trigger(availableNow=True).start()
        else:
            self._query = writer.trigger(
                processingTime=self.cfg.processing_time
            ).start()
        return self

    def wait_until_ready(self, timeout_sec: float = 60.0) -> bool:
        """Reference WaitUntilReady: returns once the pipeline is live
        (query started and not failed)."""
        if self._query is None:
            return True  # snapshot_only: synchronous, already done
        import time

        deadline = time.time() + timeout_sec
        while time.time() < deadline:
            if self._query.exception() is not None:
                raise self._query.exception()
            if self._query.isActive:
                return True
            time.sleep(0.05)
        return False

    def await_drained(self) -> None:
        """Block until an availableNow run finishes (snapshot_only drain)."""
        if self._query is not None:
            self._query.awaitTermination()

    def close(self) -> None:
        """Reference Close (connector.go:120-127): stop the source, flush the
        tail. foreachBatch completes the in-flight batch before stop returns;
        the checkpoint holds the ack frontier."""
        if self._query is not None and self._query.isActive:
            self._query.stop()

    def read(self) -> DataFrame:
        return self.view.read()
