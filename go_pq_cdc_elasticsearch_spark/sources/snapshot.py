"""Consistent-snapshot source (upstream U1 semantics).

The reference's upstream takes a consistent Postgres snapshot
(pg_export_snapshot), splits it into chunks (default 8000 rows,
README.md:224) and has workers claim/heartbeat/reclaim chunks
(README.md:225-227); modes: initial / never / snapshot_only.

Spark mapping: chunk claiming + heartbeats + reclaim == Spark's task
scheduler + retries, for free. What remains is a *partitioned* read:

- live Postgres: ``spark.read.jdbc`` with partitionColumn/lowerBound/
  upperBound/numPartitions (each partition = one chunk-range query);
- testdata/bench: parquet is already chunked by row-group; we surface the
  same knob by computing numPartitions from the configured chunk size so
  plans match cluster expectations.

``snapshot_only`` mode == a plain batch job over this source;
``initial`` == run this, record the stream start offset, then hand off to
the streaming pipeline (see streaming/pipeline.py).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from go_pq_cdc_elasticsearch_spark.catalog import load_table, table_path
from go_pq_cdc_elasticsearch_spark.operators.chunks import chunk_count

DEFAULT_CHUNK_SIZE = 8000  # reference README.md:224


def _parquet_data_files(path: str) -> list[str]:
    """The parquet files Spark's reader will actually scan under ``path``:
    recursive (partitioned datasets nest files under key=value subdirs)
    but EXCLUDING any file whose relative path has a component starting
    with '_' or '.' — Spark skips those (``_temporary`` from an
    in-progress/crashed write, ``_stage`` dirs, dotfiles), so counting
    them inflated the sizing stats: a half-complete overwrite doubled
    n_rows and forced ~2x the correct chunk parallelism with nothing
    failing loudly (review r8)."""
    if not os.path.isdir(path):
        return [path]
    out = []
    for f in sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ):
        rel = os.path.relpath(f, path)
        if any(part.startswith(("_", ".")) for part in rel.split(os.sep)):
            continue
        out.append(f)
    return out


def parquet_footer_stats(path: str) -> tuple[int, int]:
    """(num_rows, total_bytes) for a parquet file or directory, read from
    footer metadata only — no Spark job, no data pages touched. This is the
    snapshot-sizing input: at 100 TB an extra count() pre-pass is a full
    second scan of the table, while footers are a few KB per file.

    Directories are walked recursively via ``_parquet_data_files`` (which
    also mirrors Spark's hidden-path exclusions), and a directory with no
    parquet files at all raises instead of reporting an empty table: a
    (0, 0) answer for a layout the glob merely couldn't see silently
    disabled the chunked read's parallelism while load_table read the
    nested data fine (review r7). A genuinely empty table still has a
    zero-row part file."""
    import pyarrow.parquet as pq

    files = _parquet_data_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    n_rows = 0
    n_bytes = 0
    for f in files:
        n_rows += pq.ParquetFile(f).metadata.num_rows
        n_bytes += os.path.getsize(f)
    return n_rows, n_bytes


def parquet_feed_empty(
    path: str, column: str | None = None, le: float | None = None
) -> bool:
    """True iff the parquet table — optionally filtered to ``column <= le``
    — is PROVABLY empty from footer metadata alone (row counts + row-group
    min statistics; no Spark job, no data pages). Any row group whose min
    for ``column`` is <= ``le`` must contain a matching row (the min IS a
    row's value), so one such group proves non-emptiness; all groups above
    the bound prove emptiness. Missing statistics degrade to "not provably
    empty" (False) — callers keep a read-side fallback for that case.

    This is the empty-feed gate probe (ADVICE r6): the previous
    ``limit(1).count()`` form cost one driver job per invocation, paid on
    every bench run purely to serve the zero-row robustness variant."""
    import pyarrow.parquet as pq

    # same recursive, hidden-path-excluding listing the sizing stats use
    # (review r8): the previous top-level-only glob could "prove" a MIXED
    # layout empty — a zero-row top-level part next to data nested in
    # partition subdirs passed every per-file check while Spark read the
    # nested rows fine, flipping the empty-feed gate queries to the empty
    # frame with no error
    files = _parquet_data_files(path)
    if not files:
        # no visible parquet files: degrade to "not provably empty",
        # never claim emptiness for data the listing didn't see
        return False
    for f in files:
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        if column is None or le is None:
            return False  # unfiltered: any row disproves emptiness
        try:
            idx = md.schema.names.index(column)
        except ValueError:
            return False  # column absent from footer schema: can't prove
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is None or not stats.has_min_max:
                return False  # stats missing: not provably empty
            try:
                if stats.min is not None and stats.min <= le:
                    return False  # the min IS a row's value: a match exists
            except TypeError:
                # non-numeric footer min (string column): can't prove —
                # degrade to False per the contract (review r6)
                return False
    return True


def _parse_bytes(v: str) -> int:
    """Spark byte-size conf values: plain digits or k/m/g/t/p(b) suffixed
    (the full suffix set Spark's own byteStringAs parser accepts)."""
    v = v.strip().lower().removesuffix("b")
    mult = {
        "k": 1 << 10,
        "m": 1 << 20,
        "g": 1 << 30,
        "t": 1 << 40,
        "p": 1 << 50,
    }.get(v[-1:], 1)
    return int(v[:-1] if mult > 1 else v) * mult


def snapshot_read(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> DataFrame:
    """Chunked snapshot read of a testdata table.

    Row/byte counts come from the parquet footer metadata (no count()
    pre-pass — that was a full extra scan). The scan's natural partition
    count is estimated as file bytes / spark.sql.files.maxPartitionBytes;
    only when the natural split yields FEWER partitions than the
    chunk-derived count (each natural partition wider than a chunk) do we
    repartition up, so small tables stay single-partition and big tables
    get the parallelism the reference's chunking provides. (At cluster
    scale, the JDBC variant below is the real path; this keeps plan shape
    comparable.)
    """
    df = load_table(spark, sf_dir, table)
    path = table_path(sf_dir, table)
    n_rows, n_bytes = parquet_footer_stats(path)
    parts = max(1, chunk_count(n_rows, chunk_size))
    # Spark's ACTUAL split sizing, not a bare bytes/maxPartitionBytes
    # ratio (review r8): maxSplitBytes = min(maxPartitionBytes,
    # max(openCostInBytes, totalBytes/defaultParallelism)) and the packer
    # charges openCost per file — the bare ratio only ever UNDERcounted
    # the natural partitions, so the repartition branch fired (a full
    # shuffle of the snapshot) for scans that already met the
    # chunk-derived parallelism on their own.
    max_part = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    open_cost = _parse_bytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    )
    parallelism = max(1, spark.sparkContext.defaultParallelism)
    n_files = len(_parquet_data_files(path))
    max_split = min(max_part, max(open_cost, -(-n_bytes // parallelism)))
    natural = max(1, -(-(n_bytes + n_files * open_cost) // max_split))
    if natural < parts:
        df = df.repartition(parts)
    return df


def snapshot_read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    **options: str,
) -> DataFrame:
    """Live-Postgres snapshot: partitioned JDBC read where each partition is
    one chunk range (upstream chunk == Spark input partition). Not exercised
    in tests (no database in the container); the range arithmetic is shared
    with snapshot_read and unit-tested.
    """
    num_partitions = max(1, chunk_count(upper_bound - lower_bound + 1, chunk_size))
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
