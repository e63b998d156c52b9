"""Custom pgwal streaming DataSource: LSN offsets, catch-up partitioning,
commit-as-ack, end-to-end into the materialized view."""

import json
import os
import tempfile

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView
from go_pq_cdc_elasticsearch_spark.sources import wal as W


def _msg(lsn, op, key, val):
    return {
        "lsn": lsn,
        "op": op,
        "table_schema": "public",
        "table_name": "users",
        "before": {"id": str(key)} if op == "DELETE" else None,
        "after": None if op == "DELETE" else {"id": str(key), "v": str(val)},
        "ts": "2024-01-01T00:00:00",
    }


def test_wal_stream_end_to_end_with_ack(spark):
    work = tempfile.mkdtemp(prefix="wal_t_")
    wal_dir = os.path.join(work, "wal")
    W.write_wal_segment(wal_dir, [_msg(1, "INSERT", 1, "a"), _msg(2, "INSERT", 2, "b")])
    W.write_wal_segment(wal_dir, [_msg(3, "UPDATE", 1, "a2"), _msg(4, "DELETE", 2, 0)])

    W.register(spark)
    stream = spark.readStream.format("pgwal").option("path", wal_dir).load()

    view = MaterializedView(
        spark,
        os.path.join(work, "view"),
        keys=("key",),
        seq_col="lsn",
        op_col="op",
        delete_op="DELETE",
    )

    def xform(df):
        img = F.coalesce(df["after"], df["before"])
        return df.select(
            "lsn", "op", img.getItem("id").alias("key"), img.getItem("v").alias("v")
        )

    q = (
        xform(stream)
        .writeStream.foreachBatch(view.foreach_batch_writer())
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    state = {r["key"]: r["v"] for r in view.read().collect()}
    assert state == {"1": "a2"}  # key 2 deleted, key 1 updated

    # new WAL arrives; restart from checkpoint picks up ONLY lsn > 4
    W.write_wal_segment(wal_dir, [_msg(5, "INSERT", 3, "c")])
    q = (
        xform(spark.readStream.format("pgwal").option("path", wal_dir).load())
        .writeStream.foreachBatch(view.foreach_batch_writer())
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = {r["key"]: r["v"] for r in view.read().collect()}
    assert state == {"1": "a2", "3": "c"}

    # ack progression (commit == StandbyStatusUpdate): Spark acks offset N
    # once batch N+1 completes — the same flush-then-ack lag the reference
    # has (bulk/bulk.go:271-276: ack fires after the NEXT successful flush
    # cycle touches the saved context). After the restart batch (lsn 5),
    # phase 1's frontier {"lsn": 4} must be committed.
    committed = [
        json.loads(ln)
        for ln in open(os.path.join(wal_dir, "_committed")).read().splitlines()
    ]
    assert {"lsn": 4} in committed


def test_wal_partitions_split_catchup_by_segment(spark):
    work = tempfile.mkdtemp(prefix="wal_p_")
    wal_dir = os.path.join(work, "wal")
    W.write_wal_segment(wal_dir, [_msg(i, "INSERT", i, i) for i in range(1, 6)])
    W.write_wal_segment(wal_dir, [_msg(i, "INSERT", i, i) for i in range(6, 11)])
    r = W.WalStreamReader({"path": wal_dir})
    assert r.latestOffset() == {"lsn": 10}
    parts = r.partitions({"lsn": -1}, {"lsn": 10})
    assert len(parts) == 2  # one per segment: parallel catch-up
    rows = [row for p in parts for row in r.read(p)]
    assert sorted(x[0] for x in rows) == list(range(1, 11))
    # a resumed range reads only the tail
    parts = r.partitions({"lsn": 7}, {"lsn": 10})
    rows = [row for p in parts for row in r.read(p)]
    assert sorted(x[0] for x in rows) == [8, 9, 10]
