"""Handler presets and the python_handler escape hatch (reference R3-R5)."""

import json

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark import handlers as H
from go_pq_cdc_elasticsearch_spark import model
from go_pq_cdc_elasticsearch_spark.catalog import load_table


def _envelope(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").limit(200)
    env = model.envelope_from_events(events)
    # op mapping for handler tests: error plays DELETE, purchase plays UPDATE
    op = (
        F.when(F.col("op") == "ERROR", model.DELETE)
        .when(F.col("op") == "PURCHASE", model.UPDATE)
        .otherwise(model.INSERT)
    )
    env = env.withColumn("op", op)
    env = env.withColumn(
        "old_data", F.when(model.is_delete(), F.coalesce("old_data", "new_data"))
    ).withColumn("new_data", F.when(~model.is_delete(), F.coalesce("new_data", "old_data")))
    return env.withColumn("index", F.lit("events-idx"))


def test_simple_handler_ops(spark, sf_dir):
    env = _envelope(spark, sf_dir)
    acts = H.simple_handler(env)
    by_action = {
        r["action"]: r["n"]
        for r in acts.groupBy("action").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_del = env.filter(model.is_delete()).count()
    n_all = env.count()
    assert by_action.get("delete", 0) == n_del
    assert by_action.get("index", 0) == n_all - n_del
    one = acts.filter(F.col("action") == "index").first()
    assert json.loads(one["source"])["operation"] in (model.INSERT, model.UPDATE)


def test_snapshot_handler_filters(spark, sf_dir):
    env = _envelope(spark, sf_dir)
    acts = H.snapshot_handler(env)
    n_ins = env.filter(model.is_insert() | model.is_snapshot()).count()
    assert acts.count() == n_ins
    assert acts.filter(F.col("action") == "delete").count() == 0


def test_script_update_handler(spark, sf_dir):
    env = _envelope(spark, sf_dir)
    acts = H.script_update_handler(env)
    rows = acts.collect()
    assert rows and all(r["action"] == "script_update" for r in rows)
    body = json.loads(rows[0]["source"])
    assert "params" in body and "delta" in body["params"]
    assert body["source"].startswith("ctx._source")


def test_python_handler_parity_with_declarative(spark, sf_dir):
    env = _envelope(spark, sf_dir).select(
        "seq", "op", "old_data", "new_data", "index"
    )

    def user_fn(msg):
        # the reference's simple handler, in user-space python
        if msg["op"] == "DELETE":
            return [
                {
                    "action": "delete",
                    "doc_id": msg["old_data"]["id"],
                    "index": msg["index"],
                }
            ]
        doc = dict(msg["new_data"])
        doc["operation"] = msg["op"]
        return [
            {
                "action": "index",
                "doc_id": msg["new_data"]["id"],
                "index": msg["index"],
                "source": doc,
            }
        ]

    got = {
        (r["seq"], r["action"], r["doc_id"], r["index"])
        for r in H.python_handler(user_fn)(env).collect()
    }
    want = {
        (r["seq"], r["action"], r["doc_id"], r["index"])
        for r in H.simple_handler(env).collect()
    }
    assert got == want


def test_python_handler_empty_result_filters(spark, sf_dir):
    env = _envelope(spark, sf_dir)
    only_deletes = H.python_handler(
        lambda m: []
        if m["op"] != "DELETE"
        else [{"action": "delete", "doc_id": m["old_data"]["id"], "index": m["index"]}]
    )(env.select("seq", "op", "old_data", "new_data", "index"))
    assert only_deletes.count() == env.filter(model.is_delete()).count()


def test_enrichment_overwrites_existing_operation_key(spark):
    # a CDC table with a real column named 'operation' must not crash the
    # map_concat under mapKeyDedupPolicy=EXCEPTION; the reference's Go map
    # assignment semantics overwrite it with the op type
    from go_pq_cdc_elasticsearch_spark.sink.actions import actions_from_envelope

    env = spark.createDataFrame(
        [(1, "INSERT", None, {"id": "7", "operation": "user-column"}, "idx")],
        "seq long, op string, old_data map<string,string>, "
        "new_data map<string,string>, index string",
    )
    [row] = actions_from_envelope(env).collect()
    import json

    assert json.loads(row["source"])["operation"] == "INSERT"


def test_parse_bytes_full_suffix_set():
    from go_pq_cdc_elasticsearch_spark.sources.snapshot import _parse_bytes

    assert _parse_bytes("134217728") == 134217728
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("1gb") == 1 << 30
    assert _parse_bytes("1tb") == 1 << 40
    assert _parse_bytes("2p") == 2 << 50


def test_script_update_params_delta_is_numeric(spark):
    """Painless `stock += params.delta` needs a NUMBER: a map-valued
    params serialized {"delta":"5.0"} and live ES would string-concat or
    throw — the typed struct must emit {"delta":5.0}."""
    import json

    from go_pq_cdc_elasticsearch_spark import model
    from go_pq_cdc_elasticsearch_spark.handlers import script_update_handler

    import datetime

    events = spark.createDataFrame(
        [(1, "purchase", 5.0, 42, datetime.datetime(2026, 1, 1), "{}")],
        "event_id long, event_type string, value double, user_id long, "
        "ts timestamp, props string",
    )
    env = model.envelope_from_events(events, table="public.events").withColumn(
        "op", F.lit(model.UPDATE)
    )
    row = script_update_handler(env).collect()[0]
    params = json.loads(row["source"])["params"]
    assert isinstance(params["delta"], float) and params["delta"] == 5.0


def test_python_handler_drops_none_doc_id(spark, sf_dir):
    """Parity with the declarative handlers' .filter(doc_id.isNotNull()):
    an action whose doc_id is None is dropped, not stringified — str(None)
    used to emit literal id "None", colliding every such row onto one
    document."""
    events = load_table(spark, sf_dir, "events").limit(10)
    env = model.envelope_from_events(events)

    def fn(msg):
        data = msg.get("new_data") or msg.get("old_data") or {}
        return [
            {"action": "index", "doc_id": data.get("missing_key"),
             "index": "idx"},  # always None -> must be dropped
            {"action": "index", "doc_id": data.get("id"), "index": "idx"},
        ]

    out = H.python_handler(fn)(env).collect()
    assert out  # the keyed actions survived
    assert all(r["doc_id"] != "None" for r in out)


def test_simple_handler_unrouted_envelope_gets_null_index(spark, sf_dir):
    """An UNROUTED envelope (no 'index' column yet) must produce
    NULL-index actions like script_update_handler does — not an
    UNRESOLVED_COLUMN AnalysisException at plan time (review r5)."""
    from go_pq_cdc_elasticsearch_spark import model
    from go_pq_cdc_elasticsearch_spark.handlers import simple_handler

    env = model.envelope_from_events(
        load_table(spark, sf_dir, "events").limit(20)
    )
    acts = simple_handler(env, id_field="id")
    rows = acts.collect()
    assert rows and all(r["index"] is None for r in rows)


def test_model_predicates_accept_string_column_name(spark, sf_dir):
    """is_delete('op') used to hit Column.__eq__ reflection and build a
    constant-FALSE literal comparison that silently dropped every row
    (review r5)."""
    from go_pq_cdc_elasticsearch_spark import model

    df = spark.createDataFrame(
        [("INSERT",), ("DELETE",), ("UPDATE",)], "op string"
    )
    assert df.filter(model.is_insert("op")).count() == 1
    assert df.filter(model.is_delete("op")).count() == 1
    assert df.filter(model.is_update(F.col("op"))).count() == 1
