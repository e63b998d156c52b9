"""Property-based CDC semantics: for ANY event stream, cdc_apply equals the
sequential reference model (apply events in seq order to a dict), and is
invariant under replay, shuffling, and batch splitting."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from go_pq_cdc_elasticsearch_spark.operators.cdc import cdc_apply, cdc_dedup

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 9),  # key
        st.sampled_from(["insert", "update", "delete"]),
        st.floats(0, 100, allow_nan=False),
    ),
    min_size=0,
    max_size=40,
)


def _model(events):
    """The reference semantics, sequentially: last op per key wins; delete
    removes the key."""
    state = {}
    for seq, (key, op, val) in enumerate(events):
        if op == "delete":
            state[key] = None
        else:
            state[key] = (seq, op, val)
    return {
        k: v for k, v in state.items() if v is not None
    }


def _spark_apply(spark, rows):
    if not rows:
        return {}
    df = spark.createDataFrame(
        [(seq, op, key, val) for seq, (key, op, val) in rows],
        "event_id long, event_type string, user_id long, value double",
    )
    return {
        r["user_id"]: (r["event_id"], r["event_type"], r["value"])
        for r in cdc_apply(df).collect()
    }


@settings(max_examples=12, deadline=None)
@given(events_strategy)
def test_cdc_apply_matches_sequential_model(spark, events):
    rows = list(enumerate(events))
    got = _spark_apply(spark, rows)
    want = _model(events)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(events_strategy, st.randoms())
def test_cdc_apply_is_order_invariant(spark, events, rnd):
    """Arrival order must not matter — only seq does (the engine's whole
    correctness argument for at-least-once + out-of-order replay)."""
    rows = list(enumerate(events))
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    assert _spark_apply(spark, rows) == _spark_apply(spark, shuffled)


@settings(max_examples=8, deadline=None)
@given(events_strategy)
def test_cdc_apply_replay_idempotent(spark, events):
    rows = list(enumerate(events))
    assert _spark_apply(spark, rows) == _spark_apply(spark, rows + rows)


@settings(max_examples=8, deadline=None)
@given(events_strategy, st.integers(1, 5))
def test_batch_split_equals_single_batch(spark, events, n_splits):
    """merge(batch1) then merge(batch2) == apply(all) — the micro-batch
    boundary must be invisible (R8 in-batch + seq-resolved cross-batch)."""
    import os
    import tempfile

    from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView

    rows = list(enumerate(events))
    if not rows:
        return
    mv = MaterializedView(
        spark, os.path.join(tempfile.mkdtemp(prefix="mv_p_"), "view")
    )
    size = max(1, len(rows) // n_splits)
    for i in range(0, len(rows), size):
        chunk = rows[i : i + size]
        df = spark.createDataFrame(
            [(seq, op, key, val) for seq, (key, op, val) in chunk],
            "event_id long, event_type string, user_id long, value double",
        )
        mv.merge_batch(df)
    got = {
        r["user_id"]: (r["event_id"], r["event_type"], r["value"])
        for r in mv.read().collect()
    }
    assert got == _model(events)
