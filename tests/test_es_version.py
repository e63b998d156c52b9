"""ES version auto-detect + _type gating + per-item success dispatch
(reference client/client.go:51-74, bulk/bulk.go:194-206,
response_handler.go:8-23) — all against fake transports, no real ES."""

import json

from go_pq_cdc_elasticsearch_spark.sink import es_bulk as EB


def _info_body(number):
    return json.dumps({"name": "node-1", "version": {"number": number}})


def test_detect_version_from_info():
    assert EB.detect_es_version(lambda: _info_body("6.8.23")) == "6.8.23"
    assert EB.detect_es_version(lambda: _info_body("8.11.0")) == "8.11.0"


def test_detect_version_fallback_on_failure():
    # reference falls back to 7.0.0 with a warning (client.go:38-45)
    def boom():
        raise OSError("connection refused")

    assert EB.detect_es_version(boom) == "7.0.0"
    assert EB.detect_es_version(lambda: "not json") == "7.0.0"
    assert EB.detect_es_version(lambda: json.dumps({"version": {}})) == "7.0.0"


def test_is_type_supported_mirrors_reference():
    # bulk/bulk.go:194-206 semantics, numeric where the reference's string
    # compare is an outright bug ("10" < "8" lexicographically would have
    # re-enabled _type on ES >= 10 and gotten every bulk rejected)
    assert EB.is_type_supported("6.8.23")
    assert EB.is_type_supported("7.17.0")
    assert not EB.is_type_supported("8.11.0")
    assert not EB.is_type_supported("9.0.0")
    assert not EB.is_type_supported("10.0.0")  # the lexicographic trap
    assert EB.is_type_supported("")  # empty => supported, like the reference


def test_resolve_type_name_gates_on_version():
    assert EB.resolve_type_name("_doc", "6.8.0") == "_doc"
    assert EB.resolve_type_name("_doc", "7.10.0") == "_doc"
    assert EB.resolve_type_name("_doc", "8.0.0") is None
    assert EB.resolve_type_name(None, "6.8.0") is None
    # no version known => pass through (config may force it)
    assert EB.resolve_type_name("_doc", None) == "_doc"


def _ok_transport(seen_payloads):
    def transport(payload: bytes) -> str:
        seen_payloads.append(payload)
        items = []
        for line in payload.decode().splitlines():
            d = json.loads(line)
            for verb in ("index", "delete", "update"):
                if verb in d and "_id" in d[verb]:
                    items.append(
                        {verb: {"_id": d[verb]["_id"], "_index": d[verb]["_index"], "status": 200}}
                    )
        return json.dumps({"errors": False, "items": items})

    return transport


def test_type_gate_end_to_end(spark):
    df = spark.createDataFrame(
        [("index", "1", "t", None, "{}")],
        "action string, doc_id string, index string, routing string, source string",
    )
    for version, want_type in (("6.8.0", True), ("8.1.0", False)):
        seen = []
        EB.write_bulk(df, _ok_transport(seen), type_name="_doc", es_version=version)
        metas = [
            json.loads(p.decode().splitlines()[0])["index"] for p in seen
        ]
        assert all(("_type" in m) == want_type for m in metas), version


def test_success_dispatch_records_acked_items(spark):
    # R13: OnSuccess-equivalent records for acked items (handleResponse
    # dispatches OnSuccess per item, bulk/bulk.go:392-411)
    def mixed_transport(payload: bytes) -> str:
        import json as _json

        items = []
        for line in payload.decode().splitlines():
            d = _json.loads(line)
            for verb in ("index", "delete", "update"):
                if verb in d and "_id" in d[verb]:
                    _id = d[verb]["_id"]
                    if _id == "2":
                        items.append({verb: {"_id": _id, "_index": d[verb]["_index"],
                                             "status": 500, "error": {"reason": "boom"}}})
                    else:
                        items.append({verb: {"_id": _id, "_index": d[verb]["_index"], "status": 200}})
        return _json.dumps({"errors": True, "items": items})

    df = spark.createDataFrame(
        [("index", str(i), "t", None, "{}") for i in (1, 2, 3)],
        "action string, doc_id string, index string, routing string, source string",
    )
    results = {r["doc_id"]: r for r in EB.write_bulk_results(df, mixed_transport).collect()}
    assert results["1"]["ok"] and results["1"]["error"] is None
    assert results["3"]["ok"] and results["3"]["status"] == 200
    assert not results["2"]["ok"] and "boom" in results["2"]["error"]
    # the DLQ view is exactly the OnError side
    dlq = EB.write_bulk_with_dlq(df, mixed_transport).collect()
    assert [r["doc_id"] for r in dlq] == ["2"]
