"""Property-based check of the bucketed incremental MERGE: for ANY event
stream split into ANY batch boundaries, the materialized view equals the
sequential reference model (apply in seq order to a dict; delete removes),
regardless of bucket count — including replayed batches (at-least-once)."""

import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 7),  # key
        st.sampled_from(["insert", "update", "delete"]),
        st.floats(0, 100, allow_nan=False),
    ),
    min_size=1,
    max_size=24,
)


def _model(events):
    state = {}
    for seq, (key, op, val) in enumerate(events):
        state[key] = None if op == "delete" else (float(val), op)
    return {k: v[0] for k, v in state.items() if v is not None}


def _batches(events, cuts):
    """Split the seq-stamped rows at the given cut points."""
    rows = [(seq, op, key, float(val)) for seq, (key, op, val) in enumerate(events)]
    bounds = sorted({c % (len(rows) + 1) for c in cuts} | {0, len(rows)})
    return [
        rows[lo:hi] for lo, hi in zip(bounds, bounds[1:]) if rows[lo:hi]
    ]


@pytest.fixture(scope="module")
def mv_spark(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=events_strategy,
    cuts=st.lists(st.integers(0, 30), max_size=3),
    n_buckets=st.sampled_from([1, 3, 8]),
    replay_batch=st.booleans(),
)
def test_bucketed_merge_equals_sequential_model(
    spark, events, cuts, n_buckets, replay_batch
):
    path = os.path.join(tempfile.mkdtemp(prefix="mv_prop_"), "view")
    mv = MaterializedView(spark, path, n_buckets=n_buckets)
    batches = _batches(events, cuts)
    for rows in batches:
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, user_id long, value double"
        )
        mv.merge_batch(df)
    if replay_batch and batches:
        # at-least-once: redeliver the FIRST batch after everything else;
        # seq resolution must make it a no-op
        df = spark.createDataFrame(
            batches[0], "event_id long, event_type string, user_id long, value double"
        )
        mv.merge_batch(df)
    got = {r["user_id"]: r["value"] for r in mv.read().collect()}
    assert got == _model(events)
