"""Bucketed (co-located) joins: pre-shuffle once, join shuffle-free forever.

The biggest join lever at 100 TB: if two large tables are written
``bucketBy(n, keys)`` into the catalog, every subsequent equi-join on those
keys is planned WITHOUT an Exchange on either side — the shuffle happened
once at write time and is amortized across every downstream join. This is
Spark's native analog of co-located/partitioned joins in MPP warehouses,
and the right physical design for fact-fact joins (e.g. repeated
lineitem ⋈ orders) that would otherwise re-shuffle terabytes per query.

Requirements the helpers encode:
- both sides bucketed by the SAME keys into the SAME bucket count (Spark
  can still avoid one side's shuffle with compatible multiples, but equal
  counts avoid surprises);
- ``sortBy`` the keys at write time so the join degenerates to a zipper
  merge per bucket (no per-task sort);
- saveAsTable (catalog-backed) — plain ``parquet(path)`` loses bucketing
  metadata.

Plan contract (asserted in tests/test_plans.py): the bucketed join's
physical plan contains a SortMergeJoin and ZERO Exchange nodes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed+sorted by ``keys`` —
    the one-time shuffle that all later co-located joins amortize.

    The pre-write ``repartition`` on the same keys puts each bucket's rows
    in exactly one task, so each bucket is ONE sorted file — the layout
    Spark requires to also skip the per-task Sort at read time (with
    multiple files per bucket it keeps the bucketing but re-sorts)."""
    (
        df.repartition(n_buckets, *[F.col(k) for k in keys])
        .write.mode(mode)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys. The
    ``merge`` hint pins SortMergeJoin so a small side is not broadcast —
    the point here is the shuffle-free merge path, which stays valid when
    both sides are enormous.

    Also enables ``spark.sql.legacy.bucketedTableScan.outputOrdering``:
    since Spark 3.0 the scan reports the write-time sort order only behind
    this flag (detecting one-file-per-bucket costs a listing) — with it,
    and the one-file-per-bucket layout write_bucketed guarantees, the plan
    has neither Exchange NOR Sort."""
    # DELIBERATELY left set for the session (documented side effect, NOT
    # restored): the flag is read at physical planning/EXECUTION of the
    # returned lazy plan, which happens after this function returns — a
    # set-and-restore made the Sort reappear the moment the caller ran
    # the join (caught by test_bucketed_join_no_exchange when review r7
    # tried exactly that). The cost to unrelated bucketed scans is a
    # per-bucket file-count listing; a caller who objects can unset
    # spark.sql.legacy.bucketedTableScan.outputOrdering afterwards.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on=list(keys), how=how)
