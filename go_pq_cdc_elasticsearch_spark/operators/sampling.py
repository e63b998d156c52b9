"""Training-corpus sampling and sequence packing.

Two operations every large-scale training-data pipeline needs, built
deterministic (no RNG state) so retried tasks, replayed batches and
different cluster layouts all produce byte-identical output — the same
reason the CDC path derives everything from md5:

- ``hash_sample``: keep a row iff md5(key) maps below the rate threshold.
  Reproducible row-level sampling; stratified variant takes per-group
  rates. At 100 TB: pure column predicate, pushed into the scan, no
  shuffle, no driver state.
- ``pack_sequences``: assign documents to fixed-token-budget packs by
  cumulative token count WITHIN a partition column (pack per source/shard
  — a single global cumsum window would serialize at scale). Boundary
  semantics: the token stream is chunked at multiples of ``budget``; a doc
  belongs to the pack its preceding cumulative count falls in (docs may
  straddle budget edges — the standard stream-chunking formulation, exact
  in SQL; greedy first-fit would be order-sequential and is not needed for
  budget accounting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.operators.dedup import _hash64

SAMPLE_BUCKETS = 1_000_000


def hash_bucket(*cols: Column | str) -> Column:
    """Deterministic uniform bucket in [0, SAMPLE_BUCKETS) from md5 of the
    concatenated key columns — identical in DuckDB:
    CAST(concat('0x', substr(md5(...),1,8)) AS BIGINT) % buckets.

    Each component is NULL-coalesced to a sentinel BEFORE concat_ws:
    concat_ws drops NULL args together with their separator, so distinct
    multi-column keys differing only in NULL placement — ('x', NULL, 'y')
    vs ('x', 'y', NULL) — collided into one bucket and always shared a
    keep/drop decision (review r6; deterministic sampling bias). The
    sentinel (\\x00) keeps the encoding injective for any real text key;
    single non-NULL columns hash identically to before (the oracle-twin
    form).

    Key-type contract (review r8): string/integral/boolean/date keys only
    when cross-engine replay parity matters. The cast-to-string of a
    DOUBLE key renders via Java's shortest-repr in Spark and C++'s in
    DuckDB — the repo's verified round-3/5 trap ('1.0E25' vs '1e+25') —
    so a float-keyed sample keeps DIFFERENT rows per engine with no
    error. Columns passed by name are not type-checkable here
    (expression building has no schema); callers own the contract, and
    zero key columns is refused below (concat_ws over nothing is '' —
    every row in ONE constant bucket, an all-or-nothing 'sample')."""
    if not cols:
        raise ValueError(
            "hash_bucket: at least one key column is required — an empty "
            "key hashes every row into one constant bucket, making the "
            "sample deterministically all-or-nothing"
        )
    key = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(
                (F.col(c) if isinstance(c, str) else c).cast("string"),
                F.lit("\x00"),
            )
            for c in cols
        ],
    )
    return F.pmod(_hash64(key), F.lit(SAMPLE_BUCKETS))


def hash_sample(df: DataFrame, rate: float, key_cols: list[str]) -> DataFrame:
    """Keep ~rate of rows, deterministically by key hash."""
    return df.filter(hash_bucket(*key_cols) < int(rate * SAMPLE_BUCKETS))


def stratified_hash_sample(
    df: DataFrame, rates: dict[str, float], strata_col: str, key_cols: list[str]
) -> DataFrame:
    """Per-stratum rates (e.g. keep 100% of rare languages, 10% of the
    dominant one); strata not in ``rates`` are dropped."""
    expr = F.lit(-1)
    for stratum, rate in sorted(rates.items()):
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * SAMPLE_BUCKETS))
        ).otherwise(expr)
    return df.filter(hash_bucket(*key_cols) < expr)


def mixture_rates(
    df: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    strata_col: str,
    token_col: str,
) -> DataFrame:
    """Per-stratum sampling rates hitting a target token mixture.

    ``targets`` maps stratum -> mixture weight (e.g. DoReMi-style static
    domain weights, normalized by caller); the rate for stratum g is
    ``min(1, weight_g * budget / tokens_g)`` — i.e. sample each domain down
    (never up) toward its share of the token budget. Returns
    (stratum, group_tokens, rate) — an aggregate frame, broadcast-joined by
    ``mixture_sample``; no driver-side collect, so the same code runs at
    100 TB (strata counts are small by construction).
    """
    w = F.lit(None).cast("double")
    for stratum, weight in sorted(targets.items()):
        w = F.when(F.col(strata_col) == stratum, F.lit(weight)).otherwise(w)
    return (
        df.groupBy(strata_col)
        .agg(F.sum(token_col).cast("double").alias("group_tokens"))
        .withColumn("__w", w)
        .filter(F.col("__w").isNotNull())
        .select(
            strata_col,
            F.col("group_tokens").cast("long").alias("group_tokens"),
            # zero/NULL-token strata: NULL rate (nothing to sample toward a
            # token budget; mixture_sample then keeps no rows of it). ANSI
            # mode would raise DIVIDE_BY_ZERO on the bare division; DuckDB
            # computes NULL, so NULL is also the oracle-parity value.
            F.when(
                F.col("group_tokens") != 0,
                F.least(
                    F.lit(1.0),
                    F.col("__w") * budget_tokens / F.col("group_tokens"),
                ),
            ).alias("rate"),
        )
    )


def mixture_sample(
    df: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    strata_col: str,
    token_col: str,
    key_cols: list[str],
) -> DataFrame:
    """Deterministically sample toward a target token mixture: compute
    per-stratum rates (``mixture_rates``), broadcast-join them back, keep a
    row iff its md5 bucket falls under ``floor(rate * buckets)``. Strata not
    in ``targets`` are dropped. Replay/retry-stable like ``hash_sample``."""
    rates = mixture_rates(df, targets, budget_tokens, strata_col, token_col)
    # __-prefixed temp column like every other operator here: joining a
    # bare 'rate' onto a caller frame that already carries one raised
    # AMBIGUOUS_REFERENCE at planning time (review r7)
    return (
        df.join(
            F.broadcast(
                rates.select(strata_col, F.col("rate").alias("__rate"))
            ),
            strata_col,
        )
        .filter(
            hash_bucket(*key_cols)
            < F.floor(F.col("__rate") * SAMPLE_BUCKETS).cast("long")
        )
        .drop("__rate")
    )


def select_to_budget(
    df: DataFrame,
    budget_tokens: int,
    token_col: str,
    rank_col: str,
    id_col: str = "doc_id",
    partition_col: str | None = None,
) -> DataFrame:
    """Quality-ranked token-budget curation: keep the best documents (by
    ``rank_col`` descending, id ascending as the deterministic tie-break)
    until the cumulative token count reaches ``budget_tokens`` — per
    ``partition_col`` group when given (e.g. a per-language budget).

    A row is kept iff its cumulative sum INCLUDING itself is <= budget
    (greedy prefix — the standard curation rule). One window shuffle on the
    partition key; at scale prefer a partition column (per-domain budgets)
    over a single global window, same rationale as ``pack_sequences``.

    NULL-token convention (review r8, stated): a doc whose token count is
    NULL is DROPPED and consumes no budget — its own cumulative sum is
    NULL (window sums skip NULLs in BOTH engines, so the oracle twin
    agrees by construction) and NULL <= budget filters it; later docs'
    sums simply never include it. A doc that cannot be counted cannot be
    budgeted.
    """
    w = (
        Window.partitionBy(partition_col) if partition_col else Window.partitionBy()
    ).orderBy(F.col(rank_col).desc(), F.col(id_col))
    cum = F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("__cum", cum)
        .filter(F.col("__cum") <= budget_tokens)
        .drop("__cum")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    partition_col: str | None = None,
) -> DataFrame:
    """Add ``pack_id`` (within-partition) assigning docs to token-budget
    packs; also returns ``pack_tokens`` (cumulative tokens before the doc,
    relative to its pack start) for loader-side offset math."""
    if budget <= 0:
        # budget=0 is DIVIDE_BY_ZERO under ANSI (a job-killing exception
        # mid-stage) and silent NULL pack ids without it; negative budgets
        # produce negative ids — fail at call time like chunk_documents
        raise ValueError(f"budget must be positive, got {budget}")
    if "__pc" in docs.columns:
        # same reserved-name discipline as cdc_dedup's __rn (r7)
        raise ValueError("pack_sequences reserves the column name '__pc'")
    w = (
        Window.partitionBy(partition_col) if partition_col else Window.partitionBy()
    ).orderBy(order_col)
    # determinism contract: order_col must be UNIQUE per partition (every
    # in-repo caller orders by doc_id). Ties would make the cumulative sum
    # — and therefore pack assignments — depend on shuffle arrival order,
    # silently breaking the module's replay/retry byte-stability promise.
    prev_cum = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    # `div`, not (x / budget).cast('long'): the / is a DOUBLE division, so
    # beyond ~2^53 cumulative tokens the quotient rounds (one pack off vs
    # the oracle's exact `//`) — the repo's documented floor(bigint/N)
    # trap, and pack_tokens beside it was already exact via % (review r8)
    return (
        docs.withColumn("__pc", prev_cum.cast("long"))
        .withColumn("pack_id", F.expr(f"__pc div {int(budget)}"))
        .withColumn("pack_tokens", (F.col("__pc") % budget).cast("long"))
        .drop("__pc")
    )
