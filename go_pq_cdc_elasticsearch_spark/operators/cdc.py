"""CDC core operators: in-batch dedup (last-write-wins) and apply.

Reference semantics:
- ``cdc_dedup`` — within a pending batch, a later action with the same key
  replaces the earlier one (reference ``bulk/bulk.go:141-157``; key fn
  ``bulk/bulk.go:413-418``). Spark: ``row_number() OVER (PARTITION BY key
  ORDER BY seq DESC) = 1`` — a single hash shuffle on the key, map-side
  nothing to combine (we need the whole row), scales linearly in keys.
- ``cdc_apply`` — the ES index is a last-write-wins keyed map maintained by
  idempotent upserts/deletes; applying a change batch == keep the latest
  event per key, drop keys whose latest event is a delete. This is the
  engine's materialized-view operator (reference R8+R9+R12 composed).
- ``scripted_update_merge`` — the reference's Painless script-update action
  (``elasticsearch/action.go:43-51``, example/script-update/main.go:110-187)
  re-expressed as merge-time aggregation expressions.
- ``op_index_metrics`` — per-op/per-index counters
  (``elasticsearch/bulk/metric.go:75-112``).

Scale notes: dedup/apply shuffle once on the document key. At 100 TB the key
space (doc ids) is high-cardinality and near-uniform, so the hash shuffle is
well balanced; AQE skew-join/partition coalescing handles stragglers. No
driver-side state, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_dedup(
    df: DataFrame,
    keys: Sequence[str] = ("user_id",),
    seq_col: str = "event_id",
) -> DataFrame:
    """Last-write-wins compaction: keep only the latest row per key.

    Mirrors the reference's in-batch dedup (bulk/bulk.go:141-157): a later
    action with the same (id, index[, routing]) replaces the earlier one.
    ``seq_col`` is the explicit total order (LSN analog).
    """
    if "__rn" in df.columns:
        # same reserved-name discipline as asof_join: withColumn would
        # silently OVERWRITE the caller's column and the epilogue drop
        # would vanish it (review r7)
        raise ValueError("cdc_dedup reserves the column name '__rn'")
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def cdc_apply(
    df: DataFrame,
    keys: Sequence[str] = ("user_id",),
    seq_col: str = "event_id",
    op_col: str = "event_type",
    delete_op: str = "delete",
) -> DataFrame:
    """Materialize current state from a change feed: latest event per key
    wins; keys whose latest event is a delete are absent from the state.

    This is the semantic content of the reference's keyed upsert/delete sink
    (bulk/bulk.go:208-245 + in-batch dedup), expressed as one window + filter.

    NULL-op contract (explicit, three-valued logic): a key whose LATEST
    event carries a NULL op is EXCLUDED from the state — ``NULL !=
    'delete'`` is NULL, which the filter drops, and the SQL oracles'
    ``op <> 'delete'`` agrees. A NULL op is a malformed envelope (the
    reference's MessageType is never absent, message.go:71-78); excluding
    it is the defined behavior, not an accident — same contract in
    ``MaterializedView.read()`` and ``vacuum``.
    """
    latest = cdc_dedup(df, keys=keys, seq_col=seq_col)
    return latest.filter(F.col(op_col) != F.lit(delete_op))


def scripted_update_merge(
    events: DataFrame,
    key: str = "user_id",
    op_col: str = "event_type",
    update_op: str = "update",
) -> DataFrame:
    """Scripted-update-as-merge (reference R14, example/script-update/main.go):
    the canonical Painless script maintains a version counter and a stock
    delta per document. Re-expressed as aggregation: per key, version =
    count of updates, stock = sum of update values. The stock sum runs on
    the integer quantization ladder (floor(value·10⁴ + 0.5) summed as
    BIGINT, then one exact division back to DOUBLE): a raw double sum is
    accumulation-order-sensitive (measured: ~70% of per-user sums change
    bits between Spark's partial-agg merge order and a sequential fold),
    and a per-row double→DECIMAL cast is engine-divergent (Java
    shortest-repr parse vs exact-binary conversion). Every ladder step is
    a single correctly-rounded IEEE op or exact integer arithmetic, so the
    result is bit-identical across engines AND the output type is plain
    DOUBLE — never DECIMAL, which external harnesses canonicalize
    differently than Spark does.
    """
    v = F.col("value").cast("double")
    # bound the floor into long range (cross-engine trap: Spark
    # floor(double)->BIGINT silently SATURATES at ±2^63 while DuckDB
    # errors on the cast — |v| < 9e14 keeps v*1e4 < 9e18 < 2^63). An
    # out-of-ladder value contributes NULL to the stock sum on BOTH
    # engines (excluded, like any unrepresentable measurement) instead of
    # a silently saturated garbage addend.
    quantized = F.when(
        F.abs(v) < F.lit(9.0e14), F.floor(v * F.lit(10000.0) + F.lit(0.5))
    )
    return (
        events.filter(F.col(op_col) == F.lit(update_op))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("version"),
            # each addend is bounded < 2^63 but the AGGREGATE is not:
            # summing as BIGINT raised ANSI ARITHMETIC_OVERFLOW on two
            # in-ladder 5e14 values while DuckDB's sum(BIGINT) widens to
            # HUGEINT and succeeds — crash AND divergence (review r6).
            # DECIMAL(38,0) accumulation is exact (the connected_components
            # pattern); the single cast to double stays correctly rounded.
            (
                F.sum(quantized.cast("decimal(38,0)")).cast("double")
                / F.lit(10000.0)
            ).alias("stock"),
        )
    )


def op_index_metrics(actions: DataFrame, op_col: str = "event_type") -> DataFrame:
    """Per-op counters (reference metric.go:75-112 index_total/delete_total).

    On a write-plan DataFrame this is groupBy(op, index).count(); Catalyst
    plans a partial (map-side) count before the shuffle, so the shuffle
    volume is #groups per partition, not #rows.
    """
    group_cols = [op_col]
    if "index" in actions.columns:
        group_cols.append("index")
    return actions.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
