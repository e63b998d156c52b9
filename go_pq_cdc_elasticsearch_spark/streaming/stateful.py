"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no user-visible stateful operator beyond the sink's keyed
view; the engine exposes the general building block: arbitrary per-key state
carried across micro-batches (the Structured Streaming analog of a keyed
process function). Canonical instance: running per-key totals emitted every
micro-batch — used to mirror the script-update counter semantics (R14)
incrementally instead of by re-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """(key, n_events, total_value) updated per micro-batch; state is one
    (count, sum) pair per key — O(keys) state, no raw-event retention.
    The output key column carries the INPUT key column's type (a
    hardcoded ``key long`` crashed the Arrow conversion for any non-long
    key the signature advertises)."""
    key_type = stream.schema[key_col].dataType.simpleString()

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=f"key {key_type}, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
