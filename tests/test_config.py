"""Reference-config compatibility: the Go connector's config shape
(config/config.go, README.md:100-144) maps onto engine settings with the
reference's SetDefault() semantics."""

import pytest

from go_pq_cdc_elasticsearch_spark.config import (
    EsSinkSettings,
    es_settings_from_dict,
    from_reference_config,
    load_reference_yaml,
    parse_byte_size,
    parse_duration_ms,
)

REFERENCE_README_CONFIG = {
    # the README's example config block, verbatim shape
    "cdc": {
        "host": "127.0.0.1",
        "username": "es_cdc_user",
        "password": "es_cdc_pass",
        "database": "es_cdc_db",
        "publication": {
            "name": "es_cdc_publication",
            "createIfNotExists": True,
            "operations": ["INSERT", "DELETE", "TRUNCATE", "UPDATE"],
            "tables": [{"name": "users", "replicaIdentity": "FULL"}],
        },
        "slot": {
            "name": "es_cdc_slot",
            "createIfNotExists": True,
            "slotActivityCheckerInterval": 3000,
        },
        "metric": {"port": 8081},
    },
    "elasticsearch": {
        "batchSizeLimit": 10000,
        "batchTickerDuration": "100ms",
        "tableIndexMapping": {"public.users": "users"},
        "typeName": "_doc",
        "urls": ["http://127.0.0.1:9200"],
    },
}


def test_parse_byte_size():
    assert parse_byte_size("10mb") == 10 * 1024**2
    assert parse_byte_size("512kb") == 512 * 1024
    assert parse_byte_size("1gb") == 1024**3
    assert parse_byte_size("123") == 123
    assert parse_byte_size(42) == 42
    with pytest.raises(ValueError):
        parse_byte_size("10lightyears")


def test_parse_duration_ms():
    assert parse_duration_ms("100ms") == 100.0
    assert parse_duration_ms("10s") == 10_000.0
    assert parse_duration_ms("5m") == 300_000.0
    assert parse_duration_ms("1m30s") == 90_000.0
    assert parse_duration_ms(250) == 250.0
    with pytest.raises(ValueError):
        parse_duration_ms("soon")


def test_reference_defaults_parity():
    # config/config.go:37-58 SetDefault(): 10s ticker, 1000 actions,
    # 10mb, 1 concurrent request
    s = es_settings_from_dict({})
    assert s.batch_ticker_ms == 10_000.0
    assert s.batch_size_limit == 1000
    assert s.batch_byte_size_limit == 10 * 1024**2
    assert s.concurrent_requests == 1
    assert s.compression_enabled is False


def test_readme_config_maps_fully(tmp_path):
    conn, es = from_reference_config(
        REFERENCE_README_CONFIG,
        staged_dir=str(tmp_path / "staged"),
        view_path=str(tmp_path / "view"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        keys=("id",),
    )
    assert conn.table_index_mapping == {"public.users": "users"}
    assert conn.processing_time == "100 milliseconds"
    assert conn.replication is not None
    assert conn.replication.host == "127.0.0.1"
    assert conn.replication.slot == "es_cdc_slot"
    assert conn.replication.publication == "es_cdc_publication"
    assert conn.replication.create_slot is True
    assert es.batch_size_limit == 10000
    assert es.type_name == "_doc"
    assert es.urls == ("http://127.0.0.1:9200",)
    # cdc.metric.port maps to the /metrics + /status endpoint (r10); the
    # Go listener binds all interfaces, so a ported config does too
    assert conn.metric_port == 8081
    assert conn.metric_host == "0.0.0.0"


def test_yaml_round_trip(tmp_path):
    import yaml

    p = tmp_path / "cdc.yml"
    p.write_text(yaml.safe_dump(REFERENCE_README_CONFIG))
    conn, es = load_reference_yaml(
        str(p),
        staged_dir=str(tmp_path / "staged"),
        view_path=str(tmp_path / "view"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert es.batch_ticker_ms == 100.0
    assert conn.replication.slot == "es_cdc_slot"


def test_unused_knobs_recorded_not_fatal():
    s = es_settings_from_dict(
        {
            "maxConnsPerHost": 512,
            "discoverNodesInterval": "5m",
            "disableDiscoverNodesOnStart": True,
            "rejectionLog": {"index": "cdc-rejects", "includeSource": True},
        }
    )
    assert s.ignored["maxConnsPerHost"] == 512
    assert s.rejection_log_index == "cdc-rejects"
    assert s.rejection_log_include_source is True


def test_transports_built_from_settings():
    s = EsSinkSettings(urls=("http://127.0.0.1:1",), compression_enabled=True)
    bulk, info = s.transports()
    assert callable(bulk) and callable(info)


def test_reference_config_carries_replication_credentials():
    from go_pq_cdc_elasticsearch_spark.config import from_reference_config

    conn, _es = from_reference_config(
        {
            "cdc": {
                "host": "pg",
                "username": "cdc_user",
                "password": "cdc_pass",
                "database": "cdc_db",
                "slot": {"name": "s"},
                "publication": {"name": "p"},
            },
            "elasticsearch": {"urls": ["http://127.0.0.1:9200"]},
        },
        staged_dir="/tmp/x",
        view_path="/tmp/y",
        checkpoint_dir="/tmp/z",
    )
    rs = conn.replication
    # dropping these authenticated as postgres/postgres with no password
    assert (rs.user, rs.database, rs.password) == ("cdc_user", "cdc_db", "cdc_pass")
    # protocol defaults to v1 (works on PG 10+; go-pq-cdc pins v1 too)
    assert rs.proto_version == 1


def test_reference_config_proto_version_opt_in():
    from go_pq_cdc_elasticsearch_spark.config import from_reference_config

    conn, _es = from_reference_config(
        {"cdc": {"host": "pg", "protoVersion": "2", "slot": {"name": "s"}}},
        staged_dir="/tmp/x",
        view_path="/tmp/y",
        checkpoint_dir="/tmp/z",
    )
    assert conn.replication.proto_version == 2


def test_es_urls_scalar_string_not_exploded():
    from go_pq_cdc_elasticsearch_spark.config import es_settings_from_dict

    es = es_settings_from_dict({"urls": "http://127.0.0.1:9200"})
    # tuple(str) would have produced per-character "urls"
    assert es.urls == ("http://127.0.0.1:9200",)


def test_parse_duration_bare_nanoseconds_rejected():
    """ns-SHAPED bare integers (>= 1e6 and divisible by 1e6 — every real
    time.Duration >= 1 ms is) must be rejected loudly, not silently read
    as milliseconds 1e6x off; non-ns-shaped bare values keep the
    documented 'bare numbers are milliseconds' contract at any size."""
    with pytest.raises(ValueError, match="nanoseconds"):
        parse_duration_ms(5_000_000_000)  # Go time.Duration for 5 s
    with pytest.raises(ValueError, match="nanoseconds"):
        # the reference's own default ticker as a Go integer: 100 ms =
        # 1e8 ns — the earlier >=1e9 cutoff silently made this ~28 hours
        parse_duration_ms(100_000_000)
    assert parse_duration_ms("100ms") == 100.0  # the suggested fix works
    assert parse_duration_ms(3_600_000) == 3_600_000.0  # 1 h in bare ms
    assert parse_duration_ms(999_999_999) == 999_999_999.0  # not ns-shaped
    assert parse_duration_ms(999_999) == 999_999.0  # below 1e6: always ms


def test_replication_settings_spill_dir_reaches_client(tmp_path):
    """stream_spill_dir plumbs from ReplicationSettings through
    Connector._connect_replication's ReplicationClient construction (unit:
    verify the decoder receives it via a directly-built client — the
    Connector passes rs.stream_spill_dir verbatim)."""
    import io

    from go_pq_cdc_elasticsearch_spark.sources import pgoutput as PG

    class _S:
        def makefile(self, *a, **k):
            return io.BytesIO()

    c = PG.ReplicationClient(
        _S(), slot="s", proto_version=2, stream_spill_dir=str(tmp_path)
    )
    assert c.decoder.stream_spill_dir == str(tmp_path)


def test_reference_config_proto_version_explicit_invalid_not_coerced():
    """An EXPLICIT protoVersion of 0 must reach ReplicationClient's
    fail-fast ValueError, not be silently coerced to 1 by an `or 1`
    falsy-default (advice r9): a misconfigured port of a reference
    config should fail loudly at connect, not run v1 behind the
    operator's back."""
    import io

    from go_pq_cdc_elasticsearch_spark.config import from_reference_config
    from go_pq_cdc_elasticsearch_spark.sources import pgoutput as PG

    conn, _es = from_reference_config(
        {"cdc": {"host": "pg", "protoVersion": 0, "slot": {"name": "s"}}},
        staged_dir="/tmp/x",
        view_path="/tmp/y",
        checkpoint_dir="/tmp/z",
    )
    assert conn.replication.proto_version == 0  # preserved, not coerced

    class _S:
        def makefile(self, *a, **k):
            return io.BytesIO()

    with pytest.raises(ValueError, match="proto_version"):
        PG.ReplicationClient(_S(), slot="s", proto_version=0)

    # absent and explicit-null keys still default to v1
    for cdc in ({"host": "pg"}, {"host": "pg", "protoVersion": None}):
        conn2, _ = from_reference_config(
            {"cdc": {**cdc, "slot": {"name": "s"}}},
            staged_dir="/tmp/x", view_path="/tmp/y", checkpoint_dir="/tmp/z",
        )
        assert conn2.replication.proto_version == 1


def test_reference_config_truncate_and_message_knobs():
    """r11: the engine knobs onTruncate/onMessage map like protoVersion —
    absent keeps the parity default ('ignore'), explicit values flow
    through verbatim (a bogus one fails fast in ReplicationClient)."""
    from go_pq_cdc_elasticsearch_spark.config import from_reference_config

    paths = dict(
        staged_dir="/tmp/x", view_path="/tmp/y", checkpoint_dir="/tmp/z"
    )
    conn, _ = from_reference_config(
        {"cdc": {"host": "pg", "slot": {"name": "s"}}}, **paths
    )
    assert conn.replication.on_truncate == "ignore"
    assert conn.replication.on_message == "ignore"

    conn, _ = from_reference_config(
        {
            "cdc": {
                "host": "pg",
                "slot": {"name": "s"},
                "onTruncate": "tombstone_table",
                "onMessage": "envelope",
            }
        },
        **paths,
    )
    assert conn.replication.on_truncate == "tombstone_table"
    assert conn.replication.on_message == "envelope"
