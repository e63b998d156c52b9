"""THE reference scenario end-to-end: change stream -> envelope -> route ->
handler -> in-batch dedup -> NDJSON bulk over real HTTP into a stateful
fake ES; final index contents must equal batch cdc_apply (last write wins,
deletes remove docs) — the Spark analog of
integration_test/connector_test.go:25-426."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.operators.cdc import cdc_apply
from go_pq_cdc_elasticsearch_spark.routing import IndexRouter
from go_pq_cdc_elasticsearch_spark.sink.es_bulk import http_transport
from go_pq_cdc_elasticsearch_spark.sources.replay import stage_event_files
from go_pq_cdc_elasticsearch_spark.streaming.pipeline import run_es_pipeline

STORE: dict = {}
LOCK = threading.Lock()


class _StatefulES(BaseHTTPRequestHandler):
    """Applies index/delete per arrival order — a real keyed store."""

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["Content-Length"]))
        items = []
        lines = body.decode().splitlines()
        i = 0
        with LOCK:
            while i < len(lines):
                meta = json.loads(lines[i])
                if "index" in meta:
                    doc = json.loads(lines[i + 1])
                    key = (meta["index"]["_index"], meta["index"]["_id"])
                    STORE[key] = doc
                    items.append({"index": {"_id": meta["index"]["_id"],
                                            "_index": meta["index"]["_index"], "status": 200}})
                    i += 2
                elif "delete" in meta:
                    key = (meta["delete"]["_index"], meta["delete"]["_id"])
                    STORE.pop(key, None)
                    items.append({"delete": {"_id": meta["delete"]["_id"],
                                             "_index": meta["delete"]["_index"], "status": 200}})
                    i += 1
                else:
                    i += 1
        out = json.dumps({"errors": False, "items": items}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):
        pass


@pytest.fixture()
def es_url():
    STORE.clear()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _StatefulES)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_full_reference_dataflow_into_es(spark, sf_dir, es_url):
    import os
    import tempfile

    work = tempfile.mkdtemp(prefix="es_e2e_")
    staged = os.path.join(work, "staged")
    stage_event_files(spark, sf_dir, staged, n_files=3)

    run_es_pipeline(
        spark,
        staged_dir=staged,
        checkpoint_dir=os.path.join(work, "ckpt"),
        router=IndexRouter({"public.events": "events-idx"}),
        transport=http_transport(es_url),
        # the synthetic feed has no DELETE rows: 'ERROR' plays DELETE
        op_mapping=lambda op: F.when(op == "ERROR", "DELETE").otherwise("INSERT"),
        batch_size_limit=500,
    )

    # expected: batch cdc_apply with error==delete, doc per user_id
    events = load_table(spark, sf_dir, "events")
    expected = {
        ("events-idx", str(r["user_id"])): r
        for r in cdc_apply(events, delete_op="error").collect()
    }
    assert set(STORE.keys()) == set(expected.keys())
    # document contents: enriched new image with operation field
    for key, doc in STORE.items():
        exp = expected[key]
        assert doc["id"] == str(exp["user_id"])
        assert doc["operation"] == "INSERT"
        assert abs(float(doc["value"]) - exp["value"]) < 1e-9
    # multi-batch streaming really hit the server more than once
    assert len(STORE) > 0


def test_op_mapping_remapped_delete_keeps_payload(spark, es_url):
    """A row whose ORIGINAL envelope op is DELETE (old_data only) remapped
    to a non-delete op must keep its payload. The earlier sequential
    withColumn rewrite nulled old_data before new_data's
    coalesce(new_data, old_data) read it, so the doc silently vanished
    and an OLDER event won the in-batch dedup — data-dependent at sf0.001
    (no user's final event is a 'delete' there), hence this crafted feed:
    user 7's LAST event is type 'delete', remapped to INSERT."""
    import os
    import tempfile

    from go_pq_cdc_elasticsearch_spark.sources.replay import (
        EVENTS_LONG_TS_SCHEMA,
    )

    work = tempfile.mkdtemp(prefix="es_opmap_")
    staged = os.path.join(work, "staged")
    feed = spark.createDataFrame(
        [
            (1, None, 7, "click", 1.0, "{}"),
            (2, None, 7, "delete", 9.5, "{}"),  # final event: DELETE shape
            (3, None, 8, "error", 2.0, "{}"),  # remaps to real DELETE
            (4, None, 9, "click", 3.0, "{}"),
        ],
        EVENTS_LONG_TS_SCHEMA,
    )
    feed.coalesce(1).write.parquet(staged)

    run_es_pipeline(
        spark,
        staged_dir=staged,
        checkpoint_dir=os.path.join(work, "ckpt"),
        router=IndexRouter({"public.events": "events-idx"}),
        transport=http_transport(es_url),
        op_mapping=lambda op: F.when(op == "ERROR", "DELETE").otherwise(
            "INSERT"
        ),
    )
    assert set(STORE) == {("events-idx", "7"), ("events-idx", "9")}
    # the remapped-DELETE row's payload survived and won the dedup
    assert abs(float(STORE[("events-idx", "7")]["value"]) - 9.5) < 1e-9


RAW_BODIES: list = []


class _RecordingES(_StatefulES):
    def do_POST(self):  # noqa: N802
        # capture the raw NDJSON before the stateful apply
        body_len = int(self.headers["Content-Length"])
        # peek: BaseHTTPRequestHandler reads from rfile once, so buffer it
        data = self.rfile.read(body_len)
        RAW_BODIES.append(data)
        import io

        self.rfile = io.BytesIO(data)
        self.headers.replace_header("Content-Length", str(len(data)))
        super().do_POST()


def test_config_knobs_reach_the_bulk_frames(spark, sf_dir):
    """Review r8: EsSinkSettings parsed typeName/version/concurrentRequest
    but pipeline_kwargs dropped them — a ported 'typeName: _doc' config
    against ES 6 framed every bulk line without _type (every item
    rejected) and concurrentRequest silently degraded to 1. The knobs
    must now flow config -> pipeline_kwargs -> run_es_pipeline ->
    write_bulk -> framed metadata."""
    import os
    import tempfile

    from go_pq_cdc_elasticsearch_spark.config import es_settings_from_dict

    es = es_settings_from_dict(
        {
            "urls": ["http://unused:9200"],
            "typeName": "_doc",
            "version": "6.8.23",
            "concurrentRequest": 2,
            "batchSizeLimit": 500,
        }
    )
    kw = es.pipeline_kwargs()
    assert kw["type_name"] == "_doc"
    assert kw["es_version"] == "6.8.23"
    assert kw["concurrent_requests"] == 2

    RAW_BODIES.clear()
    STORE.clear()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _RecordingES)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        work = tempfile.mkdtemp(prefix="es_knobs_")
        staged = os.path.join(work, "staged")
        stage_event_files(spark, sf_dir, staged, n_files=2)
        run_es_pipeline(
            spark,
            staged_dir=staged,
            checkpoint_dir=os.path.join(work, "ckpt"),
            router=IndexRouter({"public.events": "events-idx"}),
            transport=http_transport(f"http://127.0.0.1:{server.server_port}"),
            op_mapping=lambda op: F.when(op == "ERROR", "DELETE").otherwise(
                "INSERT"
            ),
            **kw,
        )
    finally:
        server.shutdown()
    metas = [
        json.loads(ln)
        for b in RAW_BODIES
        for ln in b.decode().splitlines()
        if ln.startswith('{"index"') or ln.startswith('{"delete"')
    ]
    assert metas, "no bulk frames recorded"
    # ES 6 + typeName => _type on EVERY metadata line
    assert all(
        next(iter(m.values())).get("_type") == "_doc" for m in metas
    ), "typeName did not reach the framed metadata"


def test_type_name_with_unknown_version_detects_or_refuses(spark, sf_dir):
    """Review r8 self-review: a configured _type with an UNKNOWN ES version
    fails either way (framing breaks ES 8, dropping breaks ES 6 — and the
    old bridge silently dropped it). run_es_pipeline must autodetect via
    an Info transport when given one, and refuse loudly otherwise."""
    import os
    import tempfile

    import pytest

    from go_pq_cdc_elasticsearch_spark.sink.es_bulk import http_info_transport

    with pytest.raises(ValueError, match="es_version is unknown"):
        run_es_pipeline(
            spark,
            staged_dir="/nonexistent",
            checkpoint_dir="/nonexistent",
            router=IndexRouter({"public.events": "events-idx"}),
            transport=lambda payload: "",
            type_name="_doc",  # version omitted, no info transport
        )

    # with an Info transport reporting ES 6, detection happens and _type
    # is framed (same recording server as the knobs test)
    RAW_BODIES.clear()
    STORE.clear()

    class _Info6(_RecordingES):
        def do_GET(self):  # noqa: N802
            out = json.dumps(
                {"name": "fake", "version": {"number": "6.8.23"}}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    server = ThreadingHTTPServer(("127.0.0.1", 0), _Info6)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{server.server_port}"
        work = tempfile.mkdtemp(prefix="es_detect_")
        staged = os.path.join(work, "staged")
        stage_event_files(spark, sf_dir, staged, n_files=2)
        run_es_pipeline(
            spark,
            staged_dir=staged,
            checkpoint_dir=os.path.join(work, "ckpt"),
            router=IndexRouter({"public.events": "events-idx"}),
            transport=http_transport(base),
            op_mapping=lambda op: F.when(op == "ERROR", "DELETE").otherwise(
                "INSERT"
            ),
            type_name="_doc",
            info_transport=http_info_transport(base),
        )
    finally:
        server.shutdown()
    metas = [
        json.loads(ln)
        for b in RAW_BODIES
        for ln in b.decode().splitlines()
        if ln.startswith('{"index"') or ln.startswith('{"delete"')
    ]
    assert metas and all(
        next(iter(m.values())).get("_type") == "_doc" for m in metas
    )
