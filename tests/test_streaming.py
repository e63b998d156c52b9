"""Streaming pipeline: multi-batch replay equivalence and checkpoint
resume (mirrors the reference's ack/restart test,
integration_test/connector_test.go:428-621: batch 1 processed, connector
down, batch 2 written, restart => nothing lost, post-restart traffic flows)."""

import os
import shutil
import tempfile

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.operators.cdc import cdc_apply
from go_pq_cdc_elasticsearch_spark.sources.replay import stage_event_files
from go_pq_cdc_elasticsearch_spark.streaming.pipeline import run_cdc_stream


def test_stream_equals_batch(spark, sf_dir):
    work = tempfile.mkdtemp(prefix="stream_t_")
    staged = os.path.join(work, "staged")
    stage_event_files(spark, sf_dir, staged, n_files=4)
    view = run_cdc_stream(
        spark,
        staged_dir=staged,
        view_path=os.path.join(work, "view"),
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    stream_state = sorted(
        (r["user_id"], r["event_id"]) for r in view.read().collect()
    )
    batch_state = sorted(
        (r["user_id"], r["event_id"])
        for r in cdc_apply(load_table(spark, sf_dir, "events")).collect()
    )
    assert stream_state == batch_state


def test_initial_mode_snapshot_then_stream(spark, sf_dir):
    """Reference 'initial' mode (snapshot_test.go:25-193): pre-existing rows
    arrive via snapshot, subsequent CDC events via the stream; the handoff
    overlap (stream re-delivering snapshot rows) must not corrupt state."""
    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.streaming.pipeline import initial_load

    work = tempfile.mkdtemp(prefix="initial_t_")
    events = load_table(spark, sf_dir, "events")
    mid = events.agg(F.avg("event_id")).collect()[0][0]
    snapshot = events.filter(F.col("event_id") <= mid)

    # the stream covers everything — deliberately overlapping the snapshot
    staged = os.path.join(work, "staged")
    stage_event_files(spark, sf_dir, staged, n_files=4)

    view = initial_load(
        spark,
        snapshot_df=snapshot,
        staged_dir=staged,
        view_path=os.path.join(work, "view"),
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    got = sorted((r["user_id"], r["event_id"]) for r in view.read().collect())
    want = sorted(
        (r["user_id"], r["event_id"]) for r in cdc_apply(events).collect()
    )
    assert got == want


def test_checkpoint_resume_loses_nothing(spark, sf_dir):
    work = tempfile.mkdtemp(prefix="resume_t_")
    all_staged = os.path.join(work, "all")
    paths = stage_event_files(spark, sf_dir, all_staged, n_files=4)

    live = os.path.join(work, "live")
    os.makedirs(live)
    view_path = os.path.join(work, "view")
    ckpt = os.path.join(work, "ckpt")

    # phase 1: only the first half of the stream exists; drain it
    for p in paths[:2]:
        shutil.copy(p, live)
    run_cdc_stream(spark, live, view_path, ckpt)

    # "connector down": more WAL arrives while nothing is consuming
    for p in paths[2:]:
        shutil.copy(p, live)

    # phase 2: restart from the SAME checkpoint — only new files replay,
    # nothing is lost, nothing reapplied out of order
    view = run_cdc_stream(spark, live, view_path, ckpt)

    stream_state = sorted(
        (r["user_id"], r["event_id"]) for r in view.read().collect()
    )
    batch_state = sorted(
        (r["user_id"], r["event_id"])
        for r in cdc_apply(load_table(spark, sf_dir, "events")).collect()
    )
    assert stream_state == batch_state


def test_q_t4_single_on_time_event_drops_late_rows(spark):
    """Regenerated-data shape that broke the old parity split: ONE event
    within 24h of max(ts), everything else deliberately late — the late
    rows must be dropped (empty middle batch propagates the watermark
    into the late-record filter), matching the oracle's empty result."""
    import datetime
    import os
    import tempfile

    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.sql import REGISTRY

    base = datetime.datetime(2026, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=i * 28), i % 50, "view", 1.0, "{}")
        for i in range(1, 301)
    ]
    rows.append((999, base + datetime.timedelta(hours=42), 1, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    fake_sf = tempfile.mkdtemp(prefix="wm_adv_")
    df.withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        os.path.join(fake_sf, "events.parquet")
    )
    out = REGISTRY["q_t4_stream_watermark"].spark(spark, fake_sf)
    assert out.count() == 0  # every pre-cut row dropped as late


def test_staged_events_cache_invalidates_on_regeneration(spark, sf_dir):
    """The staging cache must restage when the SOURCE parquet changes
    in-process — a stale layout silently replays old data while the
    oracle reads the new file. Runs against a /tmp COPY of the sf dir
    (testdata itself is read-only by contract)."""
    import os
    import shutil
    import tempfile

    from go_pq_cdc_elasticsearch_spark.catalog import table_path
    from go_pq_cdc_elasticsearch_spark.streaming.pipeline import staged_events

    work = tempfile.mkdtemp(prefix="regen_sf_")
    src = table_path(sf_dir, "events")
    dst = os.path.join(work, "events.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy2)(src, dst)

    a = staged_events(spark, work, 2)
    assert a == staged_events(spark, work, 2)  # same fingerprint: reuse
    target = dst if os.path.isfile(dst) else os.path.join(
        dst, sorted(f for f in os.listdir(dst) if f.endswith(".parquet"))[0]
    )
    st = os.stat(target)
    os.utime(target, (st.st_atime, st.st_mtime + 1))  # simulate regeneration
    b = staged_events(spark, work, 2)
    assert b != a  # new fingerprint: restaged


def test_stage_slices_fails_loudly_on_null_or_out_of_range_slice(spark, tmp_path):
    """Review r7: rows whose slice value is NULL (a when() without
    otherwise()) or outside 0..n_files-1 landed in unharvested partition
    dirs and were DELETED with the staging tmp dir — the replay feed was
    silently missing events. Must raise instead."""
    import pytest as _pytest

    from go_pq_cdc_elasticsearch_spark.sources.replay import stage_slices

    df = spark.createDataFrame(
        [(1, 0), (2, 1), (3, None)], "event_id long, __f int"
    )
    with _pytest.raises(ValueError, match="outside slices"):
        stage_slices(df, str(tmp_path / "a"), n_files=2)
    df2 = spark.createDataFrame([(1, 0), (2, 7)], "event_id long, __f int")
    with _pytest.raises(ValueError, match="outside slices"):
        stage_slices(df2, str(tmp_path / "b"), n_files=2)
    # the healthy shape still stages
    ok = spark.createDataFrame([(1, 0), (2, 1)], "event_id long, __f int")
    paths = stage_slices(ok, str(tmp_path / "c"), n_files=2)
    assert len(paths) == 2


def test_stage_event_files_survives_snowflake_scale_ids(spark, tmp_path):
    """Review r7 (ANSI overflow proven live): (event_id - lo) * n_files
    as a long multiply overflows for id spans near 2^63/n_files; the
    slice offset is now double-cast before the multiply."""
    import os

    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.sources.replay import (
        EVENTS_LONG_TS_SCHEMA,
        stage_event_files,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    big = spark.createDataFrame(
        [
            (10, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
            (9_000_000_000_000_000_000, "2024-01-01 00:01:00", 2, "view", 2.0, "{}"),
            (4_500_000_000_000_000_000, "2024-01-01 00:02:00", 3, "click", 3.0, "{}"),
        ],
        EVENTS_LONG_TS_SCHEMA.replace("timestamp_ntz", "string"),
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    big.write.parquet(os.path.join(sf, "events.parquet"))
    paths = stage_event_files(spark, sf, str(tmp_path / "staged"), n_files=4)
    total = sum(
        spark.read.parquet(p).count() for p in paths
    )
    assert total == 3  # zero loss, no ARITHMETIC_OVERFLOW


def test_null_ts_and_null_event_type_parity(spark, sf_dir, tmp_path):
    """Review r8 (regeneration-fragility lens): the two nullable event
    columns the standing nulls variant never exercised. A NULL ts is
    silently filtered by Spark's TimeWindowing while a bare oracle GROUP
    BY kept a NULL group (q_t1/q_t2); a NULL event_type on a user's
    LATEST event plays INSERT on the engine side while the oracle's bare
    <> 'error' dropped it (q_t7). Both proven divergent pre-fix; this
    pins the crafted-feed parity in-tree (the extended
    tools/variant_data.py nulls variant covers it in the standing
    sweep)."""
    import glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_pq_cdc_elasticsearch_spark.sql import REGISTRY
    from go_pq_cdc_elasticsearch_spark.testing_utils import compare, duckdb_con

    dst = str(tmp_path / "sf_nulled")
    os.makedirs(dst)
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)
        if name != "events.parquet":
            shutil.copy(f, os.path.join(dst, name))
            continue
        t = pq.read_table(f)
        eid = t.column("event_id").to_pylist()
        uid = t.column("user_id").to_pylist()
        ts = t.column("ts").to_pylist()
        et = t.column("event_type").to_pylist()
        # NULL ts on one row; NULL event_type on some user's LATEST
        # event inside q_t7's event_id < 2000 staging window
        ts[0] = None
        best = {}
        for i, (e, u) in enumerate(zip(eid, uid)):
            if e is not None and e < 2000 and u is not None:
                if u not in best or e > eid[best[u]]:
                    best[u] = i
        assert best, "no eligible row for the NULL event_type probe"
        et[next(iter(best.values()))] = None
        cols = {c: t.column(c) for c in t.column_names}
        cols["ts"] = pa.array(ts, type=t.schema.field("ts").type)
        cols["event_type"] = pa.array(et, type=pa.string())
        pq.write_table(pa.table(cols), os.path.join(dst, name))

    con = duckdb_con(dst)
    for qid in ("q_t1_stream_tumbling", "q_t2_stream_sliding", "q_t7_wal_source_cdc"):
        q = REGISTRY[qid]
        problems = compare(q.spark(spark, dst), con, q.oracle)
        assert not problems, f"{qid}: {problems}"
