"""NDJSON bulk framing parity (reference bulk/bulk.go:176-245,
internal/bytes/escape.go) and flush/error contracts."""

import json

from go_pq_cdc_elasticsearch_spark.sink import es_bulk as EB


def test_escape_doc_id():
    # internal/bytes/escape_test.go cases: ONLY quotes are escaped —
    # EscapeBytes = {34}; backslashes pass through untouched
    assert EB.escape_doc_id('a"b') == 'a\\"b'
    assert EB.escape_doc_id("12345-999") == "12345-999"
    assert EB.escape_doc_id("a\\b") == "a\\b"


def test_meta_line_roundtrips_special_doc_ids():
    # ADVICE round 1: json.dumps alone must handle escaping — the meta
    # line must parse back to the ORIGINAL doc id (no double escape).
    # Wire parity: the reference escapes only because it builds raw JSON
    # bytes by hand; the parsed identity is what ES sees.
    for doc_id in ('a"b', "a\\b", 'we"ird\\id', "plain", 'q"\\"q'):
        line = EB.action_meta_line("index", doc_id, "idx")
        assert json.loads(line)["index"]["_id"] == doc_id
    # the reference's raw-bytes framing (quote-only escaping) matches
    # json.dumps for backslash-free ids; ids CONTAINING backslashes are
    # mangled by the reference itself (escape.go escapes only byte 34) —
    # the json.dumps path is strictly more correct there
    for doc_id in ('a"b', "plain", '12"34"'):
        assert json.loads('{"_id":"' + EB.escape_doc_id(doc_id) + '"}')["_id"] == doc_id


def test_index_action_framing():
    lines = list(
        EB.frame_actions(
            [
                {
                    "action": "index",
                    "doc_id": "42",
                    "index": "users",
                    "routing": None,
                    "source": '{"name":"x"}',
                }
            ]
        )
    )
    assert json.loads(lines[0]) == {"index": {"_id": "42", "_index": "users"}}
    assert lines[1] == '{"name":"x"}'


def test_delete_action_framing_no_body():
    lines = list(
        EB.frame_actions(
            [{"action": "delete", "doc_id": "7", "index": "users", "routing": "r1"}]
        )
    )
    assert len(lines) == 1
    assert json.loads(lines[0]) == {
        "delete": {"_id": "7", "_index": "users", "routing": "r1"}
    }


def test_script_update_framing_scripted_upsert():
    # reference bulk/bulk.go:230-239: update + scripted_upsert:true
    script = {"source": "ctx._source.v += params.d", "params": {"d": 1}}
    lines = list(
        EB.frame_actions(
            [
                {
                    "action": "script_update",
                    "doc_id": "9",
                    "index": "prod",
                    "routing": None,
                    "source": json.dumps(script),
                }
            ]
        )
    )
    assert json.loads(lines[0]) == {"update": {"_id": "9", "_index": "prod"}}
    body = json.loads(lines[1])
    assert body["scripted_upsert"] is True
    assert body["script"] == script


def test_type_name_gate():
    # _type emitted only when a type name is provided (ES<7 compat,
    # bulk/bulk.go:194-206)
    line = EB.action_meta_line("index", "1", "idx", None, "_doc")
    assert json.loads(line)["index"]["_type"] == "_doc"
    line = EB.action_meta_line("index", "1", "idx")
    assert "_type" not in json.loads(line)["index"]


def _mk(n):
    return [
        {
            "action": "index",
            "doc_id": str(i),
            "index": "t",
            "routing": None,
            "source": '{"v":' + str(i) + "}",
        }
        for i in range(n)
    ]


def test_count_flush_trigger():
    payloads = list(EB.bulk_payloads(_mk(2500), batch_size_limit=1000))
    assert len(payloads) == 3
    # each action = 2 lines
    assert payloads[0].count(b"\n") == 2000
    assert payloads[2].count(b"\n") == 1000


def test_byte_flush_trigger():
    payloads = list(
        EB.bulk_payloads(_mk(100), batch_size_limit=10**6, batch_byte_size_limit=500)
    )
    assert len(payloads) > 1
    assert all(len(p) < 700 for p in payloads)  # limit + one action overshoot


def test_write_bulk_records_requests(spark):
    import tempfile, os, glob
    rec_dir = tempfile.mkdtemp(prefix="bulk_rec_")

    def transport(payload: bytes) -> str:
        # executor-side recorder (local mode shares the FS); fully
        # self-contained so cloudpickle doesn't reference the test module
        import json as _json
        import os as _os

        with open(_os.path.join(rec_dir, f"{abs(hash(payload))}.ndjson"), "wb") as f:
            f.write(payload)
        items = []
        for line in payload.decode().splitlines():
            d = _json.loads(line)
            for verb in ("index", "delete", "update"):
                if verb in d and "_id" in d[verb]:
                    items.append({verb: {"_id": d[verb]["_id"], "_index": d[verb]["_index"], "status": 200}})
        return _json.dumps({"errors": False, "items": items})

    df = spark.createDataFrame(
        [("index", str(i), "t", None, '{"v":1}') for i in range(50)],
        "action string, doc_id string, index string, routing string, source string",
    )
    EB.write_bulk(df, transport, concurrent_requests=4)
    written = glob.glob(os.path.join(rec_dir, "*.ndjson"))
    total_lines = sum(open(p, "rb").read().count(b"\n") for p in written)
    assert total_lines == 100  # 50 actions x 2 lines


def test_write_bulk_error_contract(spark):
    def bad_transport(payload: bytes) -> str:
        import json as _json

        return _json.dumps(
            {"errors": True, "items": [{"index": {"_id": "1", "_index": "t", "status": 500, "error": {"reason": "boom"}}}]}
        )

    df = spark.createDataFrame(
        [("index", "1", "t", None, "{}")],
        "action string, doc_id string, index string, routing string, source string",
    )
    # no handler => fail the batch (reference panics before ack)
    import pytest

    with pytest.raises(Exception, match="bulk request had"):
        EB.write_bulk(df, bad_transport, on_error="fail")
    # handler mode => continue
    EB.write_bulk(df, bad_transport, on_error="continue")


def test_write_bulk_results_is_eager_not_replayed(spark):
    # regression: the bulk POSTs are side effects — a lazy result plan
    # would re-send every request on each action over the frame (second
    # count, AQE retry, cache eviction), double-applying non-idempotent
    # script updates. The result must be materialized once.
    import os as _os
    import tempfile as _tf

    rec_dir = _tf.mkdtemp(prefix="bulk_eager_")

    def transport(payload: bytes) -> str:
        import json as _json
        import os as _os2
        import uuid as _uuid

        with open(_os2.path.join(rec_dir, f"{_uuid.uuid4().hex}.req"), "wb") as f:
            f.write(payload)
        items = []
        for line in payload.decode().splitlines():
            d = _json.loads(line)
            for verb in ("index", "delete", "update"):
                if verb in d and "_id" in d[verb]:
                    items.append({verb: {"_id": d[verb]["_id"],
                                         "_index": d[verb]["_index"], "status": 200}})
        return _json.dumps({"errors": False, "items": items})

    df = spark.createDataFrame(
        [("index", str(i), "t", None, '{"v":1}') for i in range(10)],
        "action string, doc_id string, index string, routing string, source string",
    ).coalesce(1)
    res = EB.write_bulk_results(df, transport)
    n_after_build = len(_os.listdir(rec_dir))
    assert res.count() == 10
    assert res.filter("ok").count() == 10  # second action over the frame
    res.collect()  # third
    assert len(_os.listdir(rec_dir)) == n_after_build  # no re-sends


def test_index_action_null_source_fails_with_context():
    import pytest

    rows = [
        {"action": "index", "doc_id": "1", "index": "i", "routing": None,
         "source": None},
    ]
    with pytest.raises(ValueError, match="NULL source"):
        list(EB.frame_actions(rows))


def test_script_update_null_source_fails_with_context():
    """The script_update arm needs the same guard as index: json.loads(None)
    is an opaque mid-partition TypeError after earlier payloads POSTed."""
    import pytest

    rows = [
        {"action": "script_update", "doc_id": "7", "index": "i",
         "routing": None, "source": None},
    ]
    with pytest.raises(ValueError, match="NULL source"):
        list(EB.frame_actions(rows))


def test_write_bulk_rejects_unknown_on_error(spark):
    import pytest

    df = spark.createDataFrame(
        [("index", "1", "i", None, "{}")],
        "action string, doc_id string, index string, routing string, source string",
    )
    with pytest.raises(ValueError, match="on_error"):
        EB.write_bulk(df, transport=lambda p: "{}", on_error="Fail")


def test_unknown_action_and_null_index_fail_with_context():
    """A bare KeyError (unknown action) or a NULL _index poisoning the
    whole bulk request must surface as explicit doc-addressed errors
    before any byte frames (review r5)."""
    import pytest

    with pytest.raises(ValueError, match="unknown action"):
        list(EB.frame_actions(
            [{"action": "DELETE", "doc_id": "1", "index": "i",
              "routing": None, "source": None}]))
    with pytest.raises(ValueError, match="NULL index"):
        list(EB.frame_actions(
            [{"action": "index", "doc_id": "1", "index": None,
              "routing": None, "source": "{}"}]))
    with pytest.raises(ValueError, match="NULL doc_id"):
        list(EB.frame_actions(
            [{"action": "delete", "doc_id": None, "index": "i",
              "routing": None, "source": None}]))


def test_bulk_payload_byte_limit_is_a_ceiling():
    """Review r7: the byte trigger must flush BEFORE appending the action
    that would cross the limit — a deployment tunes the limit to the
    cluster's http.max_content_length, and the old append-then-check
    shipped one oversized request that ES rejects with a fatal 413. A
    single action larger than the limit still ships alone."""
    import json as _json

    from go_pq_cdc_elasticsearch_spark.sink.es_bulk import bulk_payloads

    def row(i, size):
        return {
            "action": "index", "doc_id": str(i), "index": "t",
            "routing": None, "source": _json.dumps({"v": "x" * size}),
        }

    limit = 2000
    rows = [row(i, 400) for i in range(20)]
    payloads = list(bulk_payloads(rows, 10**6, limit))
    assert len(payloads) > 1
    assert all(len(p) <= limit for p in payloads)
    # every action still ships exactly once, in order
    ids = [
        _json.loads(line)["index"]["_id"]
        for p in payloads
        for line in p.decode().splitlines()
        if '"index"' in line and '"_id"' in line
    ]
    assert ids == [str(i) for i in range(20)]
    # a single action above the limit ships alone (cannot be split)
    big = [row(0, 400), row(1, 5000), row(2, 400)]
    payloads = list(bulk_payloads(big, 10**6, limit))
    assert len(payloads) == 3
    assert len(payloads[1]) > limit  # the unsplittable one
    assert len(payloads[0]) <= limit and len(payloads[2]) <= limit


def test_non_bulk_response_is_loud_not_zero_item_success():
    """A 200 body WITHOUT an items array is not a bulk response (transport
    pointed at a non-ES service, proxy error page as JSON, top-level error
    shape) — treating it as zero-item success acked the batch and lost
    every document in it."""
    import pytest as _pytest

    for body in ("{}", '{"error":{"reason":"nope"},"status":400}', "[]"):
        with _pytest.raises(ValueError, match="not a bulk API response"):
            EB.parse_bulk_response(body)
    # a REAL bulk response with an empty items array still parses
    assert EB.parse_bulk_response('{"items":[],"errors":false}') == ([], [])


def test_write_bulk_continue_logs_dropped_items(caplog):
    """on_error='continue' drops rejected items by contract, but never
    silently: the worker log names the count and the first item. Tested
    at the dispatch_bulk_rows level — the exact code foreachPartition
    runs, which executes in worker processes a test can't observe."""
    import logging

    def bad_transport(payload: bytes) -> str:
        return (
            '{"errors":true,"items":[{"index":{"_id":"1","_index":"x",'
            '"status":400,"error":{"type":"mapper_parsing_exception"}}}]}'
        )

    rows = [
        {"action": "index", "doc_id": "1", "index": "x", "routing": None,
         "source": "{}"}
    ]
    with caplog.at_level(logging.WARNING):
        EB.dispatch_bulk_rows(iter(rows), bad_transport, 1000, 10**6, None,
                              "continue")
    msgs = [r.getMessage() for r in caplog.records]
    assert any("dropped 1 rejected items" in m for m in msgs), msgs


def test_script_update_malformed_json_fails_with_context():
    import pytest as _pytest

    rows = [
        {
            "action": "script_update",
            "doc_id": "k9",
            "index": "idx",
            "routing": None,
            "source": "{not json",
        }
    ]
    with _pytest.raises(ValueError, match=r"doc_id='k9'.*non-JSON script body"):
        list(EB.frame_actions(rows))
