"""Z-order (Morton curve) data layout for multi-column scan pruning.

Parquet scans prune files and row groups from column min/max statistics;
sorting by ONE column makes its stats tight but leaves every other
column's range full-width in every file. Interleaving the bits of several
normalized columns (the Morton/Z curve) makes each file cover a small
hyper-rectangle, so predicates on ANY of the curve columns prune — the
technique behind Delta/Iceberg OPTIMIZE ZORDER, expressed here as plain
column algebra + a range-partitioned sorted write.

Scale shape: the key is pure codegen bit arithmetic (shifts/masks — no
UDF); the write is one repartitionByRange shuffle (range exchange samples
the key) plus a within-partition sort. Column min/max for normalization
come from ONE tiny agg (2 values per column to the driver — bounded and
write-time-only, like any OPTIMIZE job).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, cmin: float, cmax: float, bits: int) -> Column:
    """Map a numeric column to an integer grid [0, 2^bits); NULL -> cell 0
    (least/greatest SKIP null inputs, so without the coalesce a NULL
    value floated to the TOP cell — clustered with max-value rows,
    spanning those files' min/max stats full-width)."""
    span = (cmax - cmin) or 1.0
    scaled = (col.cast("double") - F.lit(float(cmin))) / F.lit(float(span))
    grid = F.coalesce(
        F.floor(scaled * F.lit(float(2**bits))).cast("long"), F.lit(0)
    )
    return F.greatest(F.lit(0), F.least(grid, F.lit(2**bits - 1)))


def zorder_key(
    cols: Sequence[Column], ranges: Sequence[tuple[float, float]], bits: int = 16
) -> Column:
    """Morton key interleaving ``bits`` bits of each normalized column —
    pure shift/mask expressions, stays in whole-stage codegen."""
    n = len(cols)
    if bits * n > 63:
        # the interleaved key must fit a signed long; silently overflowing
        # into the sign bit would corrupt the high-order interleaving
        raise ValueError(
            f"zorder_key: bits*n_cols = {bits * n} > 63 overflows the long "
            f"key; use bits <= {63 // n} for {n} columns"
        )
    grids = [
        _normalize(c, lo, hi, bits) for c, (lo, hi) in zip(cols, ranges)
    ]
    out = F.lit(0).cast("long")
    for b in range(bits):
        for j, g in enumerate(grids):
            bit = F.shiftright(g, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + j))
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``: each
    output file covers a tight hyper-rectangle in the curve columns, so
    min/max stats prune scans filtered on any of them."""
    if not cols:
        # an empty curve-column list would interleave NOTHING: the key is
        # the constant 0, every row range-partitions into one file, and
        # the caller believes the layout is clustered — fail loudly
        raise ValueError("write_zordered needs at least one curve column")
    if "__z" in df.columns:
        # same reserved-name discipline as cdc_dedup/salted_join/merge_batch
        # (review r9): withColumn below would silently OVERWRITE the
        # caller's column and then drop it from the written output
        raise ValueError("write_zordered reserves the column name '__z'")
    bits = min(bits, 63 // len(cols))  # keep the key in a long
    # FINITE-only stats: Spark max() treats NaN as the largest double, so
    # one NaN row made span NaN and every row's grid cell 0 — the Morton
    # key silently interleaved a constant and scans pruned nothing
    # (review r7); one Inf similarly flattened every finite row to cell 0
    def _finite(c):
        d = F.col(c).cast("double")
        return F.when(~F.isnan(d) & ~d.isin(float("inf"), float("-inf")), d)

    stats = df.agg(
        *[F.min(_finite(c)).alias(f"lo_{c}") for c in cols],
        *[F.max(_finite(c)).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    # empty input / all-NULL columns have no min/max: every row (there may
    # be none, or only NULL-keyed ones) lands on grid cell 0 via (0, 1)
    ranges = [
        (stats[f"lo_{c}"], stats[f"hi_{c}"])
        if stats[f"lo_{c}"] is not None
        else (0.0, 1.0)
        for c in cols
    ]
    z = zorder_key([F.col(c) for c in cols], ranges, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
