"""Operational metrics (reference R15: per-op/per-index counters + latency
gauges, elasticsearch/bulk/metric.go:75-112, wired at connector.go:76-77).

Spark-first mapping:
- batch: ``Observation`` + ``df.observe`` — counters ride the action that
  executes the plan, zero extra passes (the reference increments counters
  inline in AddActions for the same reason).
- streaming: ``StreamingQueryListener`` receiving the same observed metrics
  per micro-batch progress event, plus Spark's own batchDuration as the
  process-latency gauge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def observed_actions(
    df: DataFrame,
    op_col: str = "event_type",
    delete_op: str = "delete",
    name: str = "cdc_metrics",
) -> tuple[DataFrame, Observation]:
    """Attach index_total / delete_total counters (metric.go:75-112 naming)
    to a write-plan DataFrame; read them from the Observation after the
    sink action runs."""
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("actions_total"),
        F.count_if(F.col(op_col) != F.lit(delete_op)).alias("index_total"),
        F.count_if(F.col(op_col) == F.lit(delete_op)).alias("delete_total"),
    )
    return out, obs


class StreamMetricsListener:
    """Collects per-micro-batch progress (rows, duration, observed metrics).

    Register with ``spark.streams.addListener(listener.as_spark_listener())``;
    ``snapshots`` accumulates one record per progress event — the engine's
    analog of the reference's process-latency gauge
    (SetProcessLatency, metric.go:67-73).
    """

    def __init__(self) -> None:
        self.snapshots: list[dict] = []

    def as_spark_listener(self):
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                p = event.progress
                outer.snapshots.append(
                    {
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "duration_ms": p.durationMs.get("triggerExecution"),
                        "observed": dict(p.observedMetrics or {}),
                    }
                )

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                pass

        return _L()
