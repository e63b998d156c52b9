"""Funnel conversion and transition counts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.operators.events import (
    funnel_conversion,
    transition_counts,
)


def _ev(uid, minute, typ, eid):
    return Row(
        user_id=uid,
        ts=dt.datetime(2024, 1, 1, minute // 60, minute % 60),
        event_type=typ,
        event_id=eid,
    )


def test_funnel_in_order_only(spark):
    df = spark.createDataFrame(
        [
            # user 1 completes the full funnel in order
            _ev(1, 0, "view", 1),
            _ev(1, 5, "click", 2),
            _ev(1, 9, "purchase", 3),
            # user 2: purchase BEFORE view/click -> only step 0+1 complete
            _ev(2, 0, "purchase", 4),
            _ev(2, 1, "view", 5),
            _ev(2, 2, "click", 6),
            # user 3: view only
            _ev(3, 0, "view", 7),
        ]
    )
    out = {r["step"]: r["n_completed"] for r in
           funnel_conversion(df, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_greedy_first_occurrence(spark):
    # view@0, click@1, purchase@2 — but also a later view@5; greedy anchors
    # at the EARLIEST view, so the funnel completes
    df = spark.createDataFrame(
        [
            _ev(1, 0, "view", 1),
            _ev(1, 1, "click", 2),
            _ev(1, 2, "purchase", 3),
            _ev(1, 5, "view", 4),
        ]
    )
    out = {r["step"]: r["n_completed"] for r in
           funnel_conversion(df, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_strictly_after(spark):
    # click at the SAME timestamp as view does not count (strictly after)
    df = spark.createDataFrame(
        [_ev(1, 0, "view", 1), _ev(1, 0, "click", 2)]
    )
    out = {r["step"]: r["n_completed"] for r in
           funnel_conversion(df, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 0}


def test_transition_counts(spark):
    df = spark.createDataFrame(
        [
            _ev(1, 0, "a", 1),
            _ev(1, 1, "b", 2),
            _ev(1, 2, "a", 3),
            _ev(2, 0, "a", 4),
            _ev(2, 1, "b", 5),
        ]
    )
    out = {(r["from_type"], r["to_type"]): r["n"] for r in
           transition_counts(df).collect()}
    assert out == {("a", "b"): 2, ("b", "a"): 1}


def test_funnel_empty_input_counts_zero(spark):
    # global agg over zero funnel-relevant rows must yield 0, not NULL
    df = spark.createDataFrame([_ev(1, 0, "unrelated", 1)])
    out = {r["step"]: r["n_completed"] for r in
           funnel_conversion(df, ["view", "click"]).collect()}
    assert out == {"view": 0, "click": 0}
    empty = spark.createDataFrame([], "user_id long, ts timestamp, event_type string, event_id long")
    out = {r["step"]: r["n_completed"] for r in
           funnel_conversion(empty, ["view", "click"]).collect()}
    assert out == {"view": 0, "click": 0}


def test_funnel_null_ts_event_does_not_wedge(spark):
    """A NULL-ts event of the first step's type sorted FIRST in the
    struct array, was greedily consumed at stage 0, and every later
    'ts > prev' was NULL — the fold wedged at stage 1 (confirmed by
    execution, review r5). NULL-ts rows are now excluded like sessionize."""
    rows = [
        (1, None, "signup", 1),
        (1, "2026-01-01 00:00:10", "signup", 2),
        (1, "2026-01-01 00:00:20", "purchase", 3),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["step"]: r["n_completed"]
        for r in funnel_conversion(df, ["signup", "purchase"]).collect()
    }
    assert out == {"signup": 1, "purchase": 1}


def test_transitions_exclude_null_ts(spark):
    """NULL-ts rows have no sequence position AND order differently across
    engines (Spark windows NULLS FIRST, DuckDB NULLS LAST) — excluded."""
    rows = [
        (1, None, "a", 1),
        (1, "2026-01-01 00:00:01", "b", 2),
        (1, "2026-01-01 00:00:02", "c", 3),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in transition_counts(df).collect()
    }
    assert got == {("b", "c"): 1}
