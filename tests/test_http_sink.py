"""End-to-end bulk protocol over real HTTP: a local server plays ES,
records NDJSON payloads, answers per-item; the engine writes a real
DataFrame through executors into it."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from go_pq_cdc_elasticsearch_spark.sink.es_bulk import (
    http_transport,
    write_bulk,
    write_bulk_with_dlq,
)

RECORDED: list[bytes] = []
FAIL_IDS: set[str] = set()
AUTH_SEEN: list[str] = []
GZIPPED: list[bool] = []


class _FakeES(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 — Info API (client/client.go:52-56)
        assert self.path == "/"
        out = json.dumps({"name": "fake", "version": {"number": "6.8.23"}}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def do_POST(self):  # noqa: N802
        assert self.path == "/_bulk"
        assert self.headers["Content-Type"] == "application/x-ndjson"
        AUTH_SEEN.append(self.headers.get("Authorization", ""))
        body = self.rfile.read(int(self.headers["Content-Length"]))
        if self.headers.get("Content-Encoding") == "gzip":
            import gzip

            body = gzip.decompress(body)
            GZIPPED.append(True)
        RECORDED.append(body)
        items = []
        for line in body.decode().splitlines():
            d = json.loads(line)
            for verb in ("index", "delete", "update"):
                if verb in d and "_id" in d[verb]:
                    _id = d[verb]["_id"]
                    if _id in FAIL_IDS:
                        items.append({verb: {"_id": _id, "_index": d[verb]["_index"],
                                             "status": 429, "error": {"reason": "busy"}}})
                    else:
                        items.append({verb: {"_id": _id, "_index": d[verb]["_index"],
                                             "status": 200}})
        out = json.dumps({"errors": bool(FAIL_IDS), "items": items}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def es_url():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _FakeES)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def _actions(spark, n=30):
    return spark.createDataFrame(
        [("index", str(i), "users", None, json.dumps({"v": i})) for i in range(n)],
        "action string, doc_id string, index string, routing string, source string",
    )


def test_write_bulk_over_real_http(spark, es_url):
    RECORDED.clear()
    FAIL_IDS.clear()
    write_bulk(
        _actions(spark),
        http_transport(es_url, username="es", password="pw"),
        batch_size_limit=10,
        concurrent_requests=3,
    )
    ids = set()
    for body in RECORDED:
        for line in body.decode().splitlines():
            d = json.loads(line)
            if "index" in d and "_id" in d["index"]:
                ids.add(d["index"]["_id"])
    assert ids == {str(i) for i in range(30)}
    # count flush trigger respected per partition request
    assert all(b.count(b'{"index"') <= 10 for b in RECORDED)
    assert any(a.startswith("Basic ") for a in AUTH_SEEN)


def test_dlq_over_real_http(spark, es_url):
    RECORDED.clear()
    FAIL_IDS.clear()
    FAIL_IDS.update({"3", "7"})
    failures = write_bulk_with_dlq(
        _actions(spark, 10), http_transport(es_url)
    ).collect()
    assert {r["doc_id"] for r in failures} == {"3", "7"}
    FAIL_IDS.clear()


def test_version_detect_over_real_http(spark, es_url):
    # detect -> gate _type -> frame: the full reference init sequence
    from go_pq_cdc_elasticsearch_spark.sink.es_bulk import (
        detect_es_version,
        http_info_transport,
    )

    version = detect_es_version(http_info_transport(es_url))
    assert version == "6.8.23"
    RECORDED.clear()
    FAIL_IDS.clear()
    write_bulk(
        _actions(spark, 3),
        http_transport(es_url),
        type_name="_doc",
        es_version=version,
    )
    metas = [
        json.loads(line)["index"]
        for b in RECORDED
        for line in b.decode().splitlines()
        if '"index"' in line.split("\n")[0] and line.startswith('{"index"')
    ]
    assert metas and all(m.get("_type") == "_doc" for m in metas)


def test_compressed_write_over_real_http(spark, es_url):
    # compressionEnabled parity: body gzipped, server sees identical NDJSON
    RECORDED.clear()
    FAIL_IDS.clear()
    GZIPPED.clear()
    write_bulk(
        _actions(spark, 8),
        http_transport(es_url, compress=True),
        concurrent_requests=1,
    )
    assert GZIPPED  # at least one request arrived gzip-encoded
    ids = {
        json.loads(line)["index"]["_id"]
        for b in RECORDED
        for line in b.decode().splitlines()
        if line.startswith('{"index"')
    }
    assert ids == {str(i) for i in range(8)}


def test_http_retry_then_error(spark):
    # nothing listening on this port: transport retries then raises
    t = http_transport("http://127.0.0.1:9", max_retries=2, timeout_sec=0.3)
    with pytest.raises(RuntimeError, match="after 2 retries"):
        t(b'{"index":{"_id":"1","_index":"t"}}\n{}\n')


def test_http_4xx_fails_fast_with_body(spark):
    """Deterministic 4xx (malformed NDJSON, payload too large) must NOT be
    re-POSTed max_retries times, and the ES error body — the part saying
    WHICH line failed — must reach the exception."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    import threading

    hits = {"n": 0}

    class _Reject(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            hits["n"] += 1
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            body = b'{"error":"malformed action line 3"}'
            self.send_response(400)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # noqa: D102
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), _Reject)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        t = http_transport(
            f"http://127.0.0.1:{server.server_port}", max_retries=5
        )
        with pytest.raises(RuntimeError, match="HTTP 400.*line 3"):
            t(b"broken\n")
        assert hits["n"] == 1  # no blind re-POST of a deterministic reject
    finally:
        server.shutdown()
