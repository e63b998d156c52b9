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
    index_col: str | None = None,
    indexes: tuple[str, ...] = (),
) -> tuple[DataFrame, Observation]:
    """Attach index_total / delete_total counters (metric.go:75-112 naming);
    read them from the Observation after the sink action runs.

    Defaults target the events-table shape (``event_type`` /
    lowercase ``delete``). Other frames MUST override both knobs —
    write-plan frames carry ``action`` with verbs ``index``/``delete``;
    the RAW pgwal envelope carries ``op`` with UPPERCASE ``DELETE``, and
    a stale lowercase default there silently books every delete as
    index_total ('DELETE' != 'delete' is true, review r6).

    ``index_col``/``indexes`` add PER-INDEX counters (keys
    ``index_total@<idx>`` / ``delete_total@<idx>``) for a routed pipeline:
    the reference increments counters per action's ACTUAL index
    (metric.go), so a multi-index batch booked onto one label would lie.
    The index set comes from the router's mapping values — known up front,
    which is what lets the breakdown ride the same single Observation
    (zero extra passes)."""
    obs = Observation(name)
    out = df.observe(
        obs, *_action_counter_cols(op_col, delete_op, index_col, indexes)
    )
    return out, obs


def _action_counter_cols(
    op_col: str,
    delete_op: str,
    index_col: str | None,
    indexes: tuple[str, ...],
) -> list:
    # every action increments exactly ONE per-op counter (metric.go: each
    # action is either index or delete), so the counters must sum to
    # actions_total: a NULL op (malformed envelope) is counted on the
    # index side — `op != delete` alone is NULL for NULL ops and count_if
    # skipped the row in BOTH buckets, silently undercounting
    not_delete = F.col(op_col).isNull() | (F.col(op_col) != F.lit(delete_op))
    is_delete = F.col(op_col) == F.lit(delete_op)
    cols = [
        F.count(F.lit(1)).alias("actions_total"),
        F.count_if(not_delete).alias("index_total"),
        F.count_if(is_delete).alias("delete_total"),
    ]
    if index_col is not None:
        for idx in indexes:
            hit = F.col(index_col) == F.lit(idx)
            cols.append(F.count_if(hit & not_delete).alias(f"index_total@{idx}"))
            cols.append(F.count_if(hit & is_delete).alias(f"delete_total@{idx}"))
    return cols


def observe_stream(
    df: DataFrame,
    name: str = "cdc_metrics",
    op_col: str = "event_type",
    delete_op: str = "delete",
    index_col: str | None = None,
    indexes: tuple[str, ...] = (),
) -> DataFrame:
    """STREAMING twin of ``observed_actions``: the ``Observation`` object is
    batch-only (its ``get`` blocks on one action), so streams use the named
    ``df.observe(name, *cols)`` form and the per-micro-batch results arrive
    in every progress event's ``observedMetrics[name]`` — which is exactly
    where ``StreamMetricsListener``/``PrometheusRegistry.observe_result``
    read them. Same counter columns, same defaults, same override rules as
    ``observed_actions``."""
    return df.observe(
        name, *_action_counter_cols(op_col, delete_op, index_col, indexes)
    )


class StreamMetricsListener:
    """Collects per-micro-batch progress (rows, duration, observed metrics).

    Register with ``spark.streams.addListener(listener.as_spark_listener())``;
    ``snapshots`` accumulates one record per progress event — the engine's
    analog of the reference's process-latency gauge
    (SetProcessLatency, metric.go:67-73).
    """

    def __init__(self, max_snapshots: int = 4096) -> None:
        # bounded: a production stream at a 1 s trigger appends one record
        # per micro-batch forever (~86k/day) — an unbounded list is a slow
        # driver-side leak. deque(maxlen) keeps the newest window at O(1);
        # long-lived aggregates belong in PrometheusRegistry gauges.
        from collections import deque

        self.snapshots: deque = deque(maxlen=max_snapshots)

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


class PrometheusRegistry:
    """Prometheus exposition parity (reference bulk/metric.go:11-112 +
    the cdc.metric.port listener): the same metric families, labels and
    namespace, rendered in text format and served on GET /metrics.

    - ``go_pq_cdc_elasticsearch_process_latency_current`` (gauge)
    - ``go_pq_cdc_elasticsearch_bulk_request_process_latency_current``
    - ``go_pq_cdc_elasticsearch_index_total{index_name=...}`` (counter)
    - ``go_pq_cdc_elasticsearch_delete_total{index_name=...}``

    Driver-side state (counters are fed from Observation results / listener
    progress, which Spark already aggregates across executors — executors
    never touch this object)."""

    NAMESPACE = "go_pq_cdc_elasticsearch"

    def __init__(self, slot_name: str = "", host: str | None = None) -> None:
        import socket
        import threading

        self.slot_name = slot_name
        self.host = host if host is not None else socket.gethostname()
        self.process_latency_ns = 0.0
        self.bulk_latency_ns = 0.0
        self.index_total: dict[str, float] = {}
        self.delete_total: dict[str, float] = {}
        self._lock = threading.Lock()
        self._server = None

    def set_process_latency(self, ns: float) -> None:
        self.process_latency_ns = float(ns)

    def set_bulk_request_latency(self, ns: float) -> None:
        self.bulk_latency_ns = float(ns)

    def increment_op(self, action: str, index: str, n: float = 1) -> None:
        with self._lock:
            target = self.index_total if action == "index" else self.delete_total
            target[index] = target.get(index, 0.0) + n

    def observe_result(self, observed: dict, index: str) -> None:
        """Feed an ``observed_actions`` Observation result for one executed
        batch. When the observation carries PER-INDEX counters
        (``index_total@<idx>`` keys, from a routed pipeline) each count is
        booked on its actual index and only the residual (rows outside the
        declared index set, e.g. prefix-probe dynamic targets) falls back
        to ``index`` — booking a whole multi-index batch on one label
        would misattribute every routed row (reference metric.go
        increments per action's actual index)."""
        booked_index = booked_delete = 0.0
        for key, v in observed.items():
            kind, sep, idx = key.partition("@")
            if not sep or not v:
                continue  # zero counts: don't materialize 0.0 label rows
            if kind not in ("index_total", "delete_total"):
                # unknown '@' keys (e.g. a future latency@idx in the same
                # Observation) must not silently inflate delete counters
                continue
            self.increment_op(
                "index" if kind == "index_total" else "delete", idx, float(v)
            )
            if kind == "index_total":
                booked_index += float(v)
            else:
                booked_delete += float(v)
        # strictly positive residuals only: an observed dict carrying
        # per-index '@' keys but no aggregate key made the residual
        # NEGATIVE and decremented a Prometheus counter — counters are
        # monotonic, so every rate()/increase() over the scrape broke
        # (proven by execution, review r8)
        rem_i = float(observed.get("index_total", 0)) - booked_index
        rem_d = float(observed.get("delete_total", 0)) - booked_delete
        if rem_i > 0:
            self.increment_op("index", index, rem_i)
        if rem_d > 0:
            self.increment_op("delete", index, rem_d)

    @staticmethod
    def _esc(v) -> str:
        # Prometheus exposition label-value escaping: \ " and newline —
        # a raw quote in an index name would otherwise break the scrape
        return (
            str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
        )

    def _labels(self, extra: dict | None = None) -> str:
        lab = {"host": self.host, "slot_name": self.slot_name}
        lab.update(extra or {})
        body = ",".join(f'{k}="{self._esc(v)}"' for k, v in sorted(lab.items()))
        return "{" + body + "}"

    def render(self) -> str:
        ns = self.NAMESPACE
        lines = [
            f"# TYPE {ns}_process_latency_current gauge",
            f"{ns}_process_latency_current{self._labels()} {self.process_latency_ns}",
            f"# TYPE {ns}_bulk_request_process_latency_current gauge",
            f"{ns}_bulk_request_process_latency_current{self._labels()} {self.bulk_latency_ns}",
        ]
        with self._lock:
            if self.index_total:
                lines.append(f"# TYPE {ns}_index_total counter")
                for idx, v in sorted(self.index_total.items()):
                    lines.append(
                        f"{ns}_index_total{self._labels({'index_name': idx})} {v}"
                    )
            if self.delete_total:
                lines.append(f"# TYPE {ns}_delete_total counter")
                for idx, v in sorted(self.delete_total.items()):
                    lines.append(
                        f"{ns}_delete_total{self._labels({'index_name': idx})} {v}"
                    )
        return "\n".join(lines) + "\n"

    def serve(
        self, port: int = 0, host: str = "127.0.0.1", status_fn=None
    ) -> int:
        """Expose GET /metrics (reference cdc.metric.port). Returns the
        bound port; daemon thread, close() shuts it down. ``host`` picks
        the bind address: the loopback default is safe for local scrapes;
        an off-host Prometheus needs host='0.0.0.0' (the reference's Go
        listener binds all interfaces).

        ``status_fn``: optional zero-arg health callback backing
        GET /status (reference README.md:247 — 200 when the client can
        reach its upstream, 503 otherwise). A raising callback reads as
        unhealthy: /status exists precisely for the moments the pipeline
        is broken."""
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        # re-serve without close(): shut the previous listener down first —
        # overwriting self._server orphaned its socket and thread, leaving
        # stale metrics scrapeable forever and EADDRINUSE on a rebind
        # (review r6 — the exact leak close() exists to prevent)
        self.close()

        registry = self

        class _H(BaseHTTPRequestHandler):
            def _respond(self, code: int, out: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

            def do_GET(self):  # noqa: N802
                if self.path == "/metrics":
                    self._respond(
                        200,
                        registry.render().encode(),
                        "text/plain; version=0.0.4; charset=utf-8",
                    )
                    return
                if self.path == "/status" and status_fn is not None:
                    try:
                        healthy = bool(status_fn())
                    except Exception:
                        healthy = False
                    self._respond(
                        200 if healthy else 503,
                        b"OK\n" if healthy else b"UNHEALTHY\n",
                        "text/plain; charset=utf-8",
                    )
                    return
                self.send_response(404)
                self.end_headers()

            def log_message(self, *a):  # silence
                pass

        self._server = ThreadingHTTPServer((host, port), _H)
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self._server.server_port

    def close(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            # shutdown() only stops serve_forever; without server_close()
            # the listening socket stays bound until GC and an immediate
            # re-serve on the same port raises EADDRINUSE
            self._server.server_close()
            self._server = None
