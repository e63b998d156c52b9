"""CDC semantics on synthesized insert/update/delete streams — mirrors the
reference's integration scenarios (connector_test.go: insert/update/delete/
ack-resume) on the envelope/apply path."""

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark import model
from go_pq_cdc_elasticsearch_spark.operators.cdc import cdc_apply, cdc_dedup
from go_pq_cdc_elasticsearch_spark.sink.actions import actions_from_envelope


def _cdc_stream(spark):
    # (seq, op, key, val): key 1 insert->update; key 2 insert->delete;
    # key 3 insert; key 4 insert->delete->insert (resurrect via later seq)
    rows = [
        (1, "insert", 1, 10.0),
        (2, "insert", 2, 20.0),
        (3, "insert", 3, 30.0),
        (4, "update", 1, 11.0),
        (5, "delete", 2, None),
        (6, "insert", 4, 40.0),
        (7, "delete", 4, None),
        (8, "insert", 4, 44.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, value double"
    )


def test_cdc_apply_final_state(spark):
    out = cdc_apply(_cdc_stream(spark)).select("user_id", "value").collect()
    state = {r["user_id"]: r["value"] for r in out}
    # key2 deleted; key1 updated; key4 reinserted after delete
    assert state == {1: 11.0, 3: 30.0, 4: 44.0}


def test_cdc_dedup_keeps_max_seq(spark):
    out = cdc_dedup(_cdc_stream(spark)).select("user_id", "event_id").collect()
    latest = {r["user_id"]: r["event_id"] for r in out}
    assert latest == {1: 4, 2: 5, 3: 3, 4: 8}


def test_apply_is_idempotent_under_replay(spark):
    df = _cdc_stream(spark)
    once = sorted(
        (r["user_id"], r["value"]) for r in cdc_apply(df).select("user_id", "value").collect()
    )
    twice = sorted(
        (r["user_id"], r["value"])
        for r in cdc_apply(df.unionAll(df)).select("user_id", "value").collect()
    )
    assert once == twice


def test_envelope_from_events(spark, sf_dir):
    from go_pq_cdc_elasticsearch_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events").limit(100)
    env = model.envelope_from_events(events)
    assert [f.name for f in env.schema.fields] == [
        "seq", "op", "event_time", "table_schema", "table_name", "old_data", "new_data",
    ]
    rows = env.collect()
    for r in rows:
        if r["op"] == model.DELETE:
            assert r["new_data"] is None and r["old_data"] is not None
        else:
            assert r["new_data"] is not None and r["old_data"] is None


def test_actions_from_envelope(spark):
    env_rows = [
        (1, "INSERT", {"id": "1", "v": "x"}, None),
        (2, "DELETE", None, {"id": "1", "v": "x"}),
    ]
    env = spark.createDataFrame(
        env_rows, "seq long, op string, new_data map<string,string>, old_data map<string,string>"
    ).withColumn("index", F.lit("users-idx"))
    acts = {r["seq"]: r for r in actions_from_envelope(env).collect()}
    assert acts[1]["action"] == "index"
    assert acts[1]["doc_id"] == "1"
    import json

    assert json.loads(acts[1]["source"])["operation"] == "INSERT"
    # delete keyed by OLD image, no body (message.go:54, action.go:36-41)
    assert acts[2]["action"] == "delete"
    assert acts[2]["doc_id"] == "1"
    assert acts[2]["source"] is None


def test_asof_join_rejects_internal_column_collision(spark):
    import pytest

    from go_pq_cdc_elasticsearch_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 99)], "k long, t long, asof_ts long"
    ).selectExpr("k", "CAST(t AS timestamp) t", "asof_ts")
    right = spark.createDataFrame([(1, 5)], "k long, rt long").selectExpr(
        "k", "CAST(rt AS timestamp) rt"
    )
    with pytest.raises(ValueError, match="asof_ts"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="rt")


def test_scripted_update_stock_sum_survives_large_values(spark):
    """Review r6: each quantized addend is bounded < 2^63, but summing as
    BIGINT overflowed under ANSI on two in-ladder 5e14 values (DuckDB's
    sum(BIGINT) widens to HUGEINT and succeeds — crash AND divergence).
    The DECIMAL(38,0) accumulation is exact at any count."""
    from go_pq_cdc_elasticsearch_spark.operators.cdc import scripted_update_merge

    df = spark.createDataFrame(
        [(1, "update", 5e14), (1, "update", 5e14), (2, "update", 1.2345)],
        "user_id long, event_type string, value double",
    )
    got = {r["user_id"]: (r["version"], r["stock"])
           for r in scripted_update_merge(df).collect()}
    assert got[1] == (2, 1e15)
    assert got[2] == (1, 1.2345)


def test_cdc_dedup_rejects_reserved_rn_column(spark):
    """Review r7: a caller column named __rn was silently clobbered and
    dropped; loud ValueError now (the asof_join discipline)."""
    import pytest as _pytest

    from go_pq_cdc_elasticsearch_spark.operators.cdc import cdc_dedup

    df = spark.createDataFrame(
        [(1, 1, "x")], "user_id long, event_id long, __rn string"
    )
    with _pytest.raises(ValueError, match="__rn"):
        cdc_dedup(df)
