"""Event-sequence analytics: funnel conversion and transition counts.

The product-analytics queries every event-log consumer runs (the
reference's events land in ES; Kibana dashboards ask exactly these):

- ``funnel_conversion``: how many entities completed step1 -> step2 -> ...
  IN ORDER (each step strictly after the previous completed step, first
  qualifying occurrence greedily) — expressed as one groupBy with ordered
  conditional MIN aggregates, no self-joins, no window cascades.
- ``transition_counts``: the first-order Markov transition matrix of event
  types per entity (lag + group count) — funnels' exploratory sibling.

Scale shapes: funnel is ONE shuffle — each entity's events are gathered
and time-sorted once (state per entity = its own events, the same bound
as sessionization), then a single greedy fold over the sorted array
advances a (stage, prev_ts) accumulator; per-step counts are a final tiny
aggregate. The tempting chained-min formulation (step i = min ts of
step-i events after step i-1's min) re-joins and re-shuffles the event
log per step — measured 6 exchanges for a 3-step funnel vs 1 here.
Transition counts: one window (lag) + one partial-aggregated groupBy,
both on the entity key — the window's hash partitioning is reused by the
groupBy.
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
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])
    # only funnel-relevant events survive to the shuffle. NULL-ts rows are
    # excluded like sessionize does: an event with no timestamp cannot
    # establish temporal order — unfiltered, a NULL-ts struct sorts FIRST
    # in array_sort, is greedily consumed at stage 0, and every later
    # 'ts > prev' is NULL so the fold wedges at stage 1 (confirmed by
    # execution, review r5); the oracle's min(ts) chain skips NULLs too
    ev = df.filter(
        F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(type_col).alias("t")
        ).alias("__e"),
    )
    seq = F.array_sort(F.collect_list("__e"))
    ts_type = dict(df.dtypes)[ts_col]  # match prev to the input's ts type
    zero = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast(ts_type).alias("prev"),
    )

    def advance(acc, e):
        # greedy: consume e iff it is the next step's type and strictly
        # after the previously matched event (no constraint at stage 0)
        matches = (acc["stage"] < k) & (
            e["t"] == F.element_at(steps_lit, acc["stage"] + 1)
        ) & ((acc["stage"] == 0) | (e["ts"] > acc["prev"]))
        return F.when(
            matches,
            F.struct(
                (acc["stage"] + 1).alias("stage"), e["ts"].alias("prev")
            ),
        ).otherwise(acc)

    per_user = ev.groupBy(key_col).agg(
        F.aggregate(seq, zero, advance)["stage"].alias("__stage")
    )
    rows = [
        F.struct(
            F.lit(i).alias("step_idx"),
            F.lit(s).alias("step"),
            # coalesce: a global agg over zero funnel-relevant rows yields
            # NULL sums; the step counts must read 0, like the oracle's
            F.coalesce(
                F.sum(F.when(F.col("__stage") >= i + 1, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_completed"),
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
    ties deterministically). NULL-ts rows are excluded (same contract and
    reason as sessionize/funnel_conversion: no timestamp, no position in
    the sequence — and their placement is ALSO engine-dependent: Spark
    windows order NULLS FIRST, DuckDB NULLS LAST, so including them made
    the transition pairs diverge across engines on any NULL ts)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    pairs = df.filter(F.col(ts_col).isNotNull()).select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
