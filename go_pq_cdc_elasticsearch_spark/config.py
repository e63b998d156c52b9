"""Reference-shaped configuration: accept the exact config the Go
connector consumes and map it onto engine settings, so an existing
deployment's config ports verbatim.

Shape (reference ``config/config.go:9-35`` + the embedded go-pq-cdc block,
``README.md:100-144``)::

    cdc:
      host: 127.0.0.1
      username: es_cdc_user
      password: es_cdc_pass
      database: es_cdc_db
      publication: {name: es_cdc_publication, createIfNotExists: true, ...}
      slot: {name: es_cdc_slot, createIfNotExists: true, ...}
    elasticsearch:
      urls: ["http://127.0.0.1:9200"]
      typeName: _doc
      batchSizeLimit: 10000
      batchTickerDuration: 100ms
      batchByteSizeLimit: 10mb
      concurrentRequest: 1
      compressionEnabled: false
      tableIndexMapping: {public.users: users}

Defaults mirror ``Config.SetDefault()`` (config/config.go:37-58): ticker
10s, batch 1000 actions / 10mb, one concurrent request. Unknown keys are
accepted and ignored (the Go yaml decoder's behavior), except the
node-discovery knobs which have no analog in a Spark executor pool —
they're recorded on the settings object for visibility but unused.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from go_pq_cdc_elasticsearch_spark.connector import (
    ConnectorConfig,
    ReplicationSettings,
)

_SIZE_UNITS = {
    "b": 1,
    "kb": 1024,
    "mb": 1024**2,
    "gb": 1024**3,
}
_DUR_UNITS = {"ns": 1e-6, "us": 1e-3, "µs": 1e-3, "ms": 1.0, "s": 1e3, "m": 6e4, "h": 3.6e6}


def parse_byte_size(v: str | int) -> int:
    """'10mb' / '512kb' / '1048576' -> bytes (reference BatchByteSizeLimit
    is a datasize string; config/config.go:12)."""
    if isinstance(v, int):
        return v
    m = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*([a-zA-Zµ]*)\s*", str(v))
    if not m:
        raise ValueError(f"unparseable byte size: {v!r}")
    num, unit = float(m.group(1)), m.group(2).lower() or "b"
    if unit not in _SIZE_UNITS:
        raise ValueError(f"unknown byte-size unit in {v!r}")
    return int(num * _SIZE_UNITS[unit])


def parse_duration_ms(v: str | int | float) -> float:
    """Go-style duration ('100ms', '10s', '5m') -> milliseconds. Bare
    numbers are taken as milliseconds (the reference's YAML integers are
    nanoseconds via time.Duration — nobody writes those by hand; ms is the
    practical reading and is what its docs show). Because that deliberate
    deviation would misread a REAL time.Duration integer by 1e6x (100 ms
    = 100000000 ns would become ~28 hours), ns-SHAPED bare numbers are
    REJECTED loudly with the fix instead of silently reinterpreted:
    every real time.Duration ≥ 1 ms is a whole multiple of 1e6 ns, so a
    bare value ≥ 1e6 divisible by 1e6 (100ms -> 1e8, 1s -> 1e9) is
    ambiguous-at-best and rejected — write '100ms'/'2h'. Bare values NOT
    divisible by 1e6 keep the documented ms contract at any size
    (3600000 for 1 h parses fine: as nanoseconds it would be the absurd
    non-round 3.6 ms). The earlier >= 1e9 cutoff silently misread the
    entire sub-second ns range — including the reference's own default
    ticker written as an integer (review r5)."""
    if isinstance(v, (int, float)):
        if v >= 1_000_000 and float(v) % 1_000_000 == 0:
            raise ValueError(
                f"bare duration {v!r} looks like a Go time.Duration in "
                f"nanoseconds ({float(v) / 1e6:g} ms); write it as a unit "
                f"string (e.g. '{float(v) / 1e6:g}ms' — or "
                f"'{float(v):g}ms' if you really meant milliseconds) to "
                f"make the scale explicit"
            )
        return float(v)
    total, pos = 0.0, 0
    for m in re.finditer(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)", str(v)):
        if m.start() != pos:
            raise ValueError(f"unparseable duration: {v!r}")
        total += float(m.group(1)) * _DUR_UNITS[m.group(2)]
        pos = m.end()
    if pos != len(str(v).strip()) or pos == 0:
        raise ValueError(f"unparseable duration: {v!r}")
    return total


@dataclass
class EsSinkSettings:
    """The elasticsearch block, resolved (reference config/config.go:9-25)."""

    urls: tuple[str, ...] = ("http://127.0.0.1:9200",)
    username: str | None = None
    password: str | None = None
    type_name: str | None = None
    es_version: str | None = None  # 'version'; autodetected when None
    batch_size_limit: int = 1000
    batch_byte_size_limit: int = 10 * 1024**2
    batch_ticker_ms: float = 10_000.0
    concurrent_requests: int = 1
    compression_enabled: bool = False
    rejection_log_index: str | None = None
    rejection_log_include_source: bool = False
    # accepted-but-unused in a Spark executor pool (single-URL transport;
    # Spark owns the connection pool): kept for config-file compatibility.
    ignored: dict[str, Any] = field(default_factory=dict)

    @property
    def processing_time(self) -> str:
        """batchTickerDuration as a Structured Streaming trigger string."""
        return f"{int(self.batch_ticker_ms)} milliseconds"

    def pipeline_kwargs(self) -> dict[str, Any]:
        """Kwargs bridge to streaming/pipeline.run_es_pipeline — every knob
        the pipeline consumes, not just flush control: typeName/version/
        concurrentRequest used to be parsed, validated, then silently
        dropped here (a ported 'typeName: _doc' config against ES 6 framed
        every bulk line without _type — review r8)."""
        return {
            "batch_size_limit": self.batch_size_limit,
            "batch_byte_size_limit": self.batch_byte_size_limit,
            "type_name": self.type_name,
            "es_version": self.es_version,
            "concurrent_requests": self.concurrent_requests,
        }

    def transports(self):
        """(bulk_transport, info_transport) across ALL configured urls,
        honoring auth + compressionEnabled — drop-in for
        write_bulk*/detect. Bulk calls round-robin the node list and each
        retry attempt rotates to the next node; the info call tries each
        node in order — the reference's []string Urls load-balancing
        (config/config.go:13, README.md:233-242). Node DISCOVERY knobs
        stay ignored (es_settings_from_dict) — the static list is the
        failover domain."""
        from go_pq_cdc_elasticsearch_spark.sink.es_bulk import (
            http_info_transport,
            http_transport,
        )

        return (
            http_transport(
                self.urls,
                self.username,
                self.password,
                compress=self.compression_enabled,
            ),
            http_info_transport(self.urls, self.username, self.password),
        )


def es_settings_from_dict(es: dict[str, Any]) -> EsSinkSettings:
    es = dict(es or {})
    ignored = {
        k: es[k]
        for k in (
            "maxConnsPerHost",
            "maxIdleConnDuration",
            "discoverNodesInterval",
            "disableDiscoverNodesOnStart",
        )
        if k in es
    }
    rej = es.get("rejectionLog") or {}
    raw_urls = es.get("urls") or ("http://127.0.0.1:9200",)
    if isinstance(raw_urls, str):
        # a scalar where the Go decoder expects []string — tuple() would
        # silently explode it into per-character "urls"
        raw_urls = (raw_urls,)
    return EsSinkSettings(
        urls=tuple(raw_urls),
        username=es.get("username") or None,
        password=es.get("password") or None,
        type_name=es.get("typeName") or None,
        es_version=es.get("version") or None,
        batch_size_limit=int(es.get("batchSizeLimit") or 1000),
        batch_byte_size_limit=parse_byte_size(
            es.get("batchByteSizeLimit") or "10mb"
        ),
        batch_ticker_ms=parse_duration_ms(
            es.get("batchTickerDuration") or "10s"
        ),
        concurrent_requests=int(es.get("concurrentRequest") or 1),
        compression_enabled=bool(es.get("compressionEnabled") or False),
        rejection_log_index=rej.get("index") or None,
        rejection_log_include_source=bool(rej.get("includeSource") or False),
        ignored=ignored,
    )


def from_reference_config(
    cfg: dict[str, Any],
    *,
    staged_dir: str,
    view_path: str,
    checkpoint_dir: str,
    keys: tuple[str, ...] = ("id",),
    seq_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "DELETE",
    snapshot_mode: str = "never",
) -> tuple[ConnectorConfig, EsSinkSettings]:
    """Map a reference-shaped config dict (parsed YAML/JSON) onto the
    engine's (ConnectorConfig, EsSinkSettings).

    The storage paths are engine-side parameters with no reference analog
    (the Go binary holds state in Postgres + ES only), so they are
    explicit keyword arguments rather than config keys."""
    es = es_settings_from_dict(cfg.get("elasticsearch") or {})
    cdc = dict(cfg.get("cdc") or {})
    repl = None
    if cdc.get("host"):
        slot = cdc.get("slot") or {}
        pub = cdc.get("publication") or {}
        repl = ReplicationSettings(
            host=cdc["host"],
            port=int(cdc.get("port") or 5432),
            slot=slot.get("name") or "cdc_slot",
            publication=pub.get("name") or "pub",
            # the reference's cdc block carries the connection credentials
            # (README.md:186-198) — dropping them authenticated as
            # postgres/postgres against the wrong database
            user=cdc.get("username") or "postgres",
            database=cdc.get("database") or "postgres",
            password=cdc.get("password"),
            create_slot=bool(slot.get("createIfNotExists", True)),
            # publication.createIfNotExists was silently DROPPED before
            # (review r5): a ported config relying on auto-creation then
            # failed at stream start with 'publication does not exist'
            create_publication=bool(pub.get("createIfNotExists", False)),
            # optional upgrade knob (no reference analog — go-pq-cdc pins
            # v1): 2 enables PG14+ streamed in-progress transactions.
            # Only an ABSENT/null key defaults to 1: `or 1` silently
            # coerced an explicit protoVersion of 0 to 1 instead of
            # letting ReplicationClient's fail-fast ValueError surface
            # the misconfiguration (advice r9)
            proto_version=(
                1
                if cdc.get("protoVersion") is None
                else int(cdc["protoVersion"])
            ),
            # engine upgrade knobs with no reference analog, same pattern
            # as protoVersion: absent/null keeps the parity default; an
            # explicit bogus value flows through so ReplicationClient's
            # fail-fast ValueError surfaces the misconfiguration
            on_truncate=(
                "ignore"
                if cdc.get("onTruncate") is None
                else str(cdc["onTruncate"])
            ),
            on_message=(
                "ignore"
                if cdc.get("onMessage") is None
                else str(cdc["onMessage"])
            ),
        )
    # cdc.metric.port (README.md:245-274): when present, the Connector
    # serves the reference's /metrics + /status API on that port. The Go
    # listener binds all interfaces; a ported config keeps that behavior
    # (metric_host stays overridable on the returned ConnectorConfig).
    metric = cdc.get("metric") or {}
    metric_port = (
        int(metric["port"]) if metric.get("port") is not None else None
    )
    conn = ConnectorConfig(
        staged_dir=staged_dir,
        view_path=view_path,
        checkpoint_dir=checkpoint_dir,
        table_index_mapping=dict(
            (cfg.get("elasticsearch") or {}).get("tableIndexMapping") or {}
        ),
        snapshot_mode=snapshot_mode,
        keys=keys,
        seq_col=seq_col,
        op_col=op_col,
        delete_op=delete_op,
        processing_time=es.processing_time,
        replication=repl,
        metric_port=metric_port,
        metric_host="0.0.0.0" if metric_port is not None else "127.0.0.1",
    )
    return conn, es


def load_reference_yaml(path: str, **paths_and_cols) -> tuple[ConnectorConfig, EsSinkSettings]:
    """Parse a reference-format YAML file and map it (PyYAML safe_load)."""
    import yaml

    with open(path) as f:
        return from_reference_config(yaml.safe_load(f) or {}, **paths_and_cols)
