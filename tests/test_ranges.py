"""Bucketed range join and batch sessionization."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.operators.ranges import (
    bucketed_range_join,
    sessionize,
)


def test_range_join_matches_naive(spark):
    pts = spark.createDataFrame(
        [Row(pid=i, v=float(i)) for i in range(0, 40)]
    )
    iv = spark.createDataFrame(
        [
            Row(band=0, lo=0.0, hi=10.0),
            Row(band=1, lo=5.0, hi=25.0),   # overlaps band 0
            Row(band=2, lo=24.0, hi=24.5),  # sub-bucket interval
            Row(band=3, lo=39.0, hi=100.0), # extends past the data
        ]
    )
    got = sorted(
        (r["pid"], r["band"])
        for r in bucketed_range_join(pts, iv, "v", width=7.0).collect()
    )
    naive = sorted(
        (r["pid"], r["band"])
        for r in pts.join(
            iv, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
        ).collect()
    )
    assert got == naive and len(got) > 0


def test_range_join_width_independent(spark):
    pts = spark.createDataFrame([Row(v=float(i) / 3) for i in range(100)])
    iv = spark.createDataFrame(
        [Row(band=b, lo=b * 4.0 - 1.5, hi=b * 4.0 + 2.5) for b in range(9)]
    )
    results = []
    for w in (0.5, 3.0, 50.0):
        rows = bucketed_range_join(pts, iv, "v", width=w).collect()
        results.append(sorted((r["v"], r["band"]) for r in rows))
    assert results[0] == results[1] == results[2]


def _ts(minute):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60)


def test_sessionize_gap_splits(spark):
    # user 1: events at minute 0, 10, 50 (gap 40 > 30 -> split), 55
    # user 2: single event
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts(0)),
            Row(user_id=1, ts=_ts(10)),
            Row(user_id=1, ts=_ts(50)),
            Row(user_id=1, ts=_ts(55)),
            Row(user_id=2, ts=_ts(7)),
        ]
    )
    out = {
        (r["user_id"], r["session_id"]): r
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11, s12 = out[(1, 1)], out[(1, 2)]
    assert s11["n_events"] == 2 and s11["session_start"] == _ts(0)
    assert s11["session_end"] == _ts(10)
    assert s12["n_events"] == 2 and s12["session_start"] == _ts(50)
    assert out[(2, 1)]["n_events"] == 1


def test_sessionize_boundary_gap_is_inclusive(spark):
    # gap exactly == gap_seconds stays one session (split needs strictly >)
    df = spark.createDataFrame(
        [Row(user_id=1, ts=_ts(0)), Row(user_id=1, ts=_ts(30))]
    )
    out = sessionize(df, gap_seconds=1800).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_sessionize_equal_timestamps_one_session(spark):
    df = spark.createDataFrame(
        [Row(user_id=1, ts=_ts(5)), Row(user_id=1, ts=_ts(5))]
    )
    out = sessionize(df, gap_seconds=60).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_sessionize_ntz_gap_stable_across_dst(spark):
    # NTZ wall times straddling the America/New_York spring-forward hour
    # (2024-03-10 02:00): the 02:30->03:10 gap is 40 wall-minutes. A
    # session-zone cast would compute it through the instant timeline
    # (where 02:30 does not exist and offsets shift), flipping the split
    # decision; the field-extraction epoch must split identically under
    # any session zone.
    import datetime as dt

    rows = [
        Row(user_id=1, ts=dt.datetime(2024, 3, 10, 1, 50)),
        Row(user_id=1, ts=dt.datetime(2024, 3, 10, 2, 30)),
        Row(user_id=1, ts=dt.datetime(2024, 3, 10, 3, 10)),
    ]
    tz_key = "spark.sql.session.timeZone"
    old = spark.conf.get(tz_key)
    results = {}
    try:
        for tz in ("UTC", "America/New_York"):
            spark.conf.set(tz_key, tz)
            df = spark.createDataFrame(rows).withColumn(
                "ts", F.col("ts").cast("timestamp_ntz")
            )
            out = sessionize(df, gap_seconds=1800).collect()
            results[tz] = sorted(
                (r["session_id"], r["n_events"]) for r in out
            )
    finally:
        spark.conf.set(tz_key, old)
    # 1:50->2:30 gap 40min > 30min splits; 2:30->3:10 gap 40min splits
    assert results["UTC"] == [(1, 1), (2, 1), (3, 1)]
    assert results["America/New_York"] == results["UTC"]


def test_sessionize_excludes_null_timestamps(spark):
    """NULL-ts rows belong to no session: Spark's NULLS-FIRST window vs
    DuckDB's NULLS-LAST would otherwise group them structurally
    differently and shift every real session_id."""
    from go_pq_cdc_elasticsearch_spark.operators.ranges import sessionize

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, None),
            (1, "2024-01-01 02:00:00"),
        ],
        "user_id long, ts string",
    ).selectExpr("user_id", "CAST(ts AS timestamp) AS ts")
    out = sessionize(df).collect()
    assert len(out) == 2  # two real sessions; the NULL row is excluded
    assert {r["n_events"] for r in out} == {1}
    assert all(r["session_start"] is not None for r in out)


def test_range_join_rejects_pathological_intervals(spark):
    import pytest

    from go_pq_cdc_elasticsearch_spark.operators.ranges import (
        bucketed_range_join,
    )

    points = spark.createDataFrame([(1, 5.0)], "id long, x double")
    wide = spark.createDataFrame([(1, 0.0, 1.0e12)], "iid long, lo double, hi double")
    with pytest.raises(ValueError, match="buckets"):
        bucketed_range_join(points, wide, "x", width=10.0).collect()
    inf = spark.createDataFrame(
        [(1, 0.0, float("inf"))], "iid long, lo double, hi double"
    )
    with pytest.raises(ValueError, match="non-finite"):
        bucketed_range_join(points, inf, "x", width=10.0).collect()


def test_asof_join_requires_join_keys(spark):
    """Review r7: an empty `on` failed deep inside the NULL-key epilogue
    with an opaque TypeError; clear ValueError up front now."""
    import pytest as _pytest

    from go_pq_cdc_elasticsearch_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 1)], "k long, ts long")
    with _pytest.raises(ValueError, match="at least one join key"):
        asof_join(df, df, on=[], left_ts="ts", right_ts="ts")


def test_range_join_reversed_intervals_and_bad_width(spark):
    """Review r7: a reversed interval (hi < lo) slipped past the
    positive-span OOM guard and F.sequence generated a DESCENDING
    cell explosion anyway; width<=0 divided by zero inside the guard.
    Reversed intervals now match nothing (empty interval semantics)."""
    import pytest as _pytest

    pts = spark.createDataFrame([(5.0,)], "x double")
    iv = spark.createDataFrame(
        [(1.0e12, -1.0e12, "rev"), (0.0, 10.0, "ok")],
        "lo double, hi double, tag string",
    )
    got = bucketed_range_join(pts, iv, "x", width=10.0).collect()
    assert [r["tag"] for r in got] == ["ok"]  # no OOM, reversed dropped
    for w in (0.0, -5.0):
        with _pytest.raises(ValueError, match="width"):
            bucketed_range_join(pts, iv, "x", width=w)


def test_range_join_reserves_bucket_column(spark):
    import pytest as _pytest

    from go_pq_cdc_elasticsearch_spark.operators.ranges import bucketed_range_join

    pts = spark.createDataFrame([(1.0, 0)], "v double, __bucket int")
    iv = spark.createDataFrame([(0.0, 2.0)], "lo double, hi double")
    with _pytest.raises(ValueError, match="__bucket.*points"):
        bucketed_range_join(pts, iv, "v")
    with _pytest.raises(ValueError, match="__bucket.*intervals"):
        bucketed_range_join(
            iv.select("lo", "hi"),
            iv.withColumnRenamed("lo", "__bucket"),
            "lo", lo_col="__bucket", hi_col="hi",
        )
