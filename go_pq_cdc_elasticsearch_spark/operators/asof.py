"""As-of join (latest right-side event at or before each left-side time).

Spark has no native as-of join (SURVEY.md Q-S8). The scalable formulation
avoids a range join entirely: union-tag both sides, sort within each key by
(time, side) and carry the last right-side value forward with a window —
ONE hash shuffle on the key, no cross product, no broadcast requirement.
This survives 100× scale-up: cost is a shuffle + per-partition sort, the
same as any keyed window.

(The alternative — join on key with ``r.ts <= l.ts`` then max — is a range
join that degenerates to per-key cross products on hot keys; only sane when
one side is tiny.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    out_col: str = "asof_ts",
) -> DataFrame:
    """Attach to each left row the greatest ``right_ts`` with
    ``right_ts <= left_ts`` among right rows sharing the join keys
    (inclusive as-of backward join). Right rows sort before left rows at
    equal timestamps so ties are included.
    """
    on = list(on)
    if not on:
        # Window.partitionBy() accepts zero columns, so an empty key list
        # only failed later in the NULL-key epilogue with an opaque
        # 'condition should be a Column' TypeError (review r7); a global
        # as-of (one partition) is expressible with a constant key
        raise ValueError(
            "asof_join requires at least one join key; for a global "
            "as-of, pass a constant key column on both sides"
        )
    reserved = {"__t", "__side", out_col}
    clash = reserved.intersection(left.columns)
    if clash:
        # withColumn would silently OVERWRITE these (and the epilogue
        # drops the internals), vanishing the caller's data — e.g. a
        # second asof_join over the output of a first one already
        # carrying 'asof_ts'; pass a different out_col instead
        raise ValueError(
            f"asof_join: left columns {sorted(clash)} collide with the "
            f"operator's internal/output names — rename them or pass a "
            f"different out_col"
        )
    l_tag = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    r_tag = right.select(
        *on, F.col(right_ts).alias("__t"), F.lit(0).alias("__side")
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        out_col,
        F.last(F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True).over(w),
    )
    # SQL equi-join semantics: NULL never equals NULL. Window.partitionBy
    # groups NULL keys into ONE partition, which would let NULL-keyed left
    # rows inherit values from NULL-keyed right rows — null the result for
    # any row with a NULL join key (matches the q_s8 correlated-subquery
    # oracle, where the equality predicate filters those rows out).
    null_key = None
    for c in on:
        cond = F.col(c).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    out = carried.withColumn(
        out_col, F.when(null_key, F.lit(None)).otherwise(F.col(out_col))
    )
    return out.filter(F.col("__side") == 1).drop("__t", "__side")
