"""Snapshot source (U1): metadata-derived partitioning, no count() pre-pass
(VERDICT round 1: the extra scan is real money at 100 TB)."""

import pytest
from pyspark.sql import DataFrame

from go_pq_cdc_elasticsearch_spark.operators.chunks import chunk_count
from go_pq_cdc_elasticsearch_spark.sources.snapshot import (
    _parse_bytes,
    parquet_footer_stats,
    snapshot_read,
)

SF = "/root/testdata/sf0.001"


def test_parse_bytes():
    assert _parse_bytes("134217728") == 134217728
    assert _parse_bytes("134217728b") == 134217728
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("128MB") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30


def test_footer_stats_match_scan(spark):
    from go_pq_cdc_elasticsearch_spark.catalog import load_table, table_path

    n_rows, n_bytes = parquet_footer_stats(table_path(SF, "lineitem"))
    assert n_rows == load_table(spark, SF, "lineitem").count()
    assert n_bytes > 0


def test_parquet_feed_empty_probe(spark, tmp_path):
    """ADVICE r6: the empty-feed gate probe must be footer-only and exact —
    a row-group min <= the bound IS a matching row; all mins above the
    bound prove the filtered feed empty."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_pq_cdc_elasticsearch_spark.catalog import table_path
    from go_pq_cdc_elasticsearch_spark.sources.snapshot import parquet_feed_empty

    # real testdata: events is non-empty, and event_id <= 2000 matches rows
    p = table_path(SF, "events")
    assert not parquet_feed_empty(p)
    assert not parquet_feed_empty(p, "event_id", 2000)

    # zero-row table: provably empty, filtered or not
    zero = str(tmp_path / "zero.parquet")
    pq.write_table(pa.table({"event_id": pa.array([], pa.int64())}), zero)
    assert parquet_feed_empty(zero)
    assert parquet_feed_empty(zero, "event_id", 2000)

    # non-empty table whose every row-group min sits ABOVE the bound:
    # filtered feed provably empty, unfiltered not
    high = str(tmp_path / "high.parquet")
    pq.write_table(
        pa.table({"event_id": pa.array([5000, 6000, 7000], pa.int64())}),
        high,
        row_group_size=2,
    )
    assert not parquet_feed_empty(high)
    assert parquet_feed_empty(high, "event_id", 2000)
    assert not parquet_feed_empty(high, "event_id", 5000)  # min is a row

    # missing column: not provably empty (callers keep a read-side belt)
    assert not parquet_feed_empty(high, "no_such_col", 1)

    # directory form: one empty + one matching file
    d = tmp_path / "dir"
    d.mkdir()
    pq.write_table(
        pa.table({"event_id": pa.array([], pa.int64())}),
        str(d / "a.parquet"),
    )
    assert parquet_feed_empty(str(d), "event_id", 10)
    pq.write_table(
        pa.table({"event_id": pa.array([3], pa.int64())}),
        str(d / "b.parquet"),
    )
    assert not parquet_feed_empty(str(d), "event_id", 10)


def test_no_spark_job_before_read(spark, monkeypatch):
    # deriving the partition width must not run count() (a full scan) or
    # convert to RDD; building the snapshot DataFrame stays lazy
    def boom(self):
        raise AssertionError("snapshot_read ran a Spark action")

    monkeypatch.setattr(DataFrame, "count", boom)
    monkeypatch.setattr(
        DataFrame, "rdd", property(lambda self: (_ for _ in ()).throw(
            AssertionError("snapshot_read converted to RDD")))
    )
    df = snapshot_read(spark, SF, "lineitem", chunk_size=500)
    monkeypatch.undo()
    # chunk-derived width applied (6k rows / 500 => >= 13 partitions)
    n_rows, _ = parquet_footer_stats(
        __import__("go_pq_cdc_elasticsearch_spark.catalog", fromlist=["table_path"])
        .table_path(SF, "lineitem")
    )
    want = chunk_count(n_rows, 500)
    assert df.rdd.getNumPartitions() == want
    assert df.count() == n_rows


def test_small_table_not_repartitioned(spark):
    # natural scan width >= chunk width => no shuffle inserted
    df = snapshot_read(spark, SF, "region", chunk_size=10**9)
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("chunk", [8000, 1000])
def test_snapshot_coverage_complete(spark, chunk):
    # every source row appears exactly once regardless of chunk width:
    # identical per-row multiset as the plain scan
    from go_pq_cdc_elasticsearch_spark.catalog import load_table

    df = snapshot_read(spark, SF, "lineitem", chunk_size=chunk)
    plain = load_table(spark, SF, "lineitem")
    assert df.count() == plain.count()
    assert df.exceptAll(plain).count() == 0
    assert plain.exceptAll(df).count() == 0


def test_footer_stats_recursive_and_loud_on_no_files(spark, tmp_path):
    """Review r7: a partitioned dataset (files nested under key=value
    dirs) read as (0, 0) by the non-recursive glob, silently disabling
    the chunked read's parallelism; a dir with no parquet at all must
    raise, not claim an empty table."""
    import pytest as _pytest

    out = str(tmp_path / "part_ds")
    spark.range(0, 1000).selectExpr("id", "id % 4 AS k").write.partitionBy(
        "k"
    ).parquet(out)
    n_rows, n_bytes = parquet_footer_stats(out)
    assert n_rows == 1000 and n_bytes > 0
    no_parquet = tmp_path / "empty_dir_without_parquet"
    no_parquet.mkdir()
    with _pytest.raises(FileNotFoundError):
        parquet_footer_stats(str(no_parquet))


def test_footer_stats_skip_hidden_paths(spark, sf_dir, tmp_path):
    """Review r8: the recursive glob counted files Spark's reader skips
    (any path component starting with '_' or '.') — a crashed write's
    _temporary dir doubled n_rows and forced ~2x the correct chunk
    parallelism with nothing failing loudly."""
    import shutil

    from go_pq_cdc_elasticsearch_spark.catalog import table_path
    from go_pq_cdc_elasticsearch_spark.sources.snapshot import (
        parquet_feed_empty,
        parquet_footer_stats,
    )

    src = table_path(sf_dir, "region")
    d = tmp_path / "region_t"
    (d / "_temporary" / "0").mkdir(parents=True)
    shutil.copy(src, d / "part-000.parquet")
    shutil.copy(src, d / "_temporary" / "0" / "part-001.parquet")
    shutil.copy(src, d / ".hidden.parquet")
    clean_rows, _ = parquet_footer_stats(src)
    n_rows, _ = parquet_footer_stats(str(d))
    assert n_rows == clean_rows, (
        f"hidden-path files inflated the stats: {n_rows} vs {clean_rows}"
    )
    # feed_empty sees through nested layouts now: a zero-row top-level
    # part next to nested real data must NOT prove the feed empty
    import pyarrow as pa
    import pyarrow.parquet as pq

    m = tmp_path / "mixed"
    (m / "k=1").mkdir(parents=True)
    t = pq.read_table(src)
    pq.write_table(t.slice(0, 0), m / "empty-part.parquet")
    pq.write_table(t, m / "k=1" / "data.parquet")
    assert parquet_feed_empty(str(m)) is False


def test_stage_event_files_null_seq_fails_loud(spark, sf_dir, tmp_path):
    """Review r8: F.least skips NULL args, so a NULL-event_id row was
    silently staged into the LAST slice (replayed out of position, no
    error) instead of hitting stage_slices' fail-loud NULL-slice guard —
    the guard written exactly for this was unreachable. A row without a
    replay position cannot be ordered."""
    import glob
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from go_pq_cdc_elasticsearch_spark.sources.replay import stage_event_files

    dst = tmp_path / "sf_nullseq"
    dst.mkdir()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)
        if name != "events.parquet":
            shutil.copy(f, dst / name)
            continue
        t = pq.read_table(f)
        eid = t.column("event_id").to_pylist()
        eid[0] = None
        cols = {c: t.column(c) for c in t.column_names}
        cols["event_id"] = pa.array(eid, type=pa.int64())
        pq.write_table(pa.table(cols), dst / name)
    with pytest.raises(Exception, match="NULL or out-of-range"):
        stage_event_files(spark, str(dst), str(tmp_path / "staged"), n_files=4)
