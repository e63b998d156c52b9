"""Incremental corpus near-dup detection: an LSH band-bucket index
maintained as a materialized view, deduplicating each arriving micro-batch
against everything already ingested.

The batch pipeline (operators/dedup.py::dedup_corpus) answers "dedup this
corpus"; a production training-data pipeline also needs "dedup what arrived
TODAY against the last N months" without recomputing the corpus — the same
incremental-vs-recompute trade the reference's keyed ES upsert makes versus
a full reindex (bulk/bulk.go:208-245: per-key writes, never a rebuild).

Design (all stages scale-shaped, nothing driver-side):

- state = MinHash band rows ``(band_idx, band_hash, doc_id)`` in a
  hash-bucketed ``MaterializedView`` whose LAYOUT key is
  ``(band_idx, band_hash)`` — so probing a batch reads ONLY the state
  buckets the batch's band hashes fall in (partition pruning), while row
  identity stays ``(band_idx, band_hash, doc_id)`` — re-processing a doc
  with the SAME text is an idempotent upsert, and the insert-only band
  rows make merges conflict-free. Doc ids are immutable content handles
  (a revision is a new id, the norm for crawl/training corpora):
  re-indexing an EXISTING id with different text is unsupported — the old
  text's band rows are distinct keys that would linger as stale
  candidates (harmless for correctness, since verification reads the
  current text and the batch side wins deterministically, but wasted
  probe work and monotonic state growth);
- candidates = batch band rows ⋈ pruned state buckets on
  ``(band_idx, band_hash)`` (cross-batch) ∪ batch self-join (in-batch) —
  shuffle bounded by batch size + matching bucket rows, never corpus size;
- verification = exact n-gram Jaccard computed CANDIDATE-ONLY: the old
  side's gram sets are derived from the corpus store restricted to the
  candidate ids (semi-join first, tokenize after);
- the union of per-batch verified pairs over a replay equals the batch
  pipeline's verified pairs on the full corpus (same hash family, same
  threshold) — asserted against the DuckDB oracle in q_lx5 and
  property-tested in test_incremental_dedup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.operators.dedup import (
    doc_ngram_sets,
    jaccard_from_sets,
    minhash_band_rows,
)
from go_pq_cdc_elasticsearch_spark.sink.materialized import (
    _BUCKET_COL,
    MaterializedView,
)


class _BandIndexView(MaterializedView):
    """Band-row state bucketed by (band_idx, band_hash) for probe-side
    partition pruning; row identity includes doc_id."""

    def _bucket_expr(self):
        return F.pmod(
            F.hash(F.col("band_idx"), F.col("band_hash")), F.lit(self.n_buckets)
        )


class LshDedupIndex:
    """Incrementally-maintained MinHash-LSH index over a document stream.

    ``process_batch`` returns the verified near-dup pairs the new batch
    introduces — against the already-indexed corpus and within itself —
    and then indexes the batch. Keep/drop policy is the caller's (see
    ``greedy_keep_filter`` for the standard first-arrival-wins fold).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 16,
        bands: int = 8,
        jaccard_threshold: float = 0.7,
        n_buckets: int | None = None,
    ):
        self.spark = spark
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.bands = bands
        self.jaccard_threshold = jaccard_threshold
        self.view = _BandIndexView(
            spark,
            os.path.join(path, "bands"),
            keys=("band_idx", "band_hash", "doc_id"),
            seq_col="seq",
            op_col="op",
            delete_op="delete",
            n_buckets=n_buckets,
        )

    # -- probing -------------------------------------------------------------

    def _indexed_bands(self, probe_bands: DataFrame) -> DataFrame:
        """State band rows from ONLY the buckets the probe's band hashes
        fall in — the read that keeps cross-batch probing independent of
        corpus size (the analog of the reference's per-shard doc-id
        routing: a bulk request touches the shards its ids hash to)."""
        if not self.view.exists() or not self.view._bucket_dirs():
            return None
        n = self.view.n_buckets
        if n == 1:
            touched = [0]
        else:
            touched = sorted(
                r["b"]
                for r in probe_bands.select(
                    F.pmod(
                        F.hash(F.col("band_idx"), F.col("band_hash")), F.lit(n)
                    ).alias("b")
                )
                .distinct()
                .collect()
            )
        if not touched:
            return None
        return self.view._read_buckets(touched).drop(_BUCKET_COL)

    def process_batch(
        self,
        batch: DataFrame,
        corpus: DataFrame,
        epoch_id: int | None = None,
    ) -> DataFrame:
        """Detect-then-index one micro-batch.

        ``corpus`` is the document store holding the text of previously
        ingested docs (the corpus table a real pipeline has anyway — the
        index stores band rows, not text). Returns verified pairs
        ``(id1, id2, jaccard)`` with ``id1 < id2``, covering new-vs-indexed
        and new-vs-new. The returned frame is computed EAGERLY (it must be
        — indexing the batch afterwards changes the state the pairs were
        probed against)."""
        id_c = self.id_col
        bands = minhash_band_rows(
            batch, self.text_col, id_c, self.k, self.bands
        ).persist()

        # in-batch candidates: self-join within shared band buckets
        a, b = bands.alias("a"), bands.alias("b")
        intra = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col(f"a.{id_c}") < F.col(f"b.{id_c}")),
            )
            .select(
                F.col(f"a.{id_c}").alias("id1"),
                F.col(f"b.{id_c}").alias("id2"),
            )
        )

        # cross-batch candidates: probe pruned state buckets
        indexed = self._indexed_bands(bands)
        if indexed is not None:
            o = indexed.alias("o")
            cross = (
                a.join(
                    o,
                    (F.col("a.band_idx") == F.col("o.band_idx"))
                    & (F.col("a.band_hash") == F.col("o.band_hash"))
                    & (F.col(f"a.{id_c}") != F.col(f"o.{id_c}")),
                )
                .select(
                    F.least(F.col(f"a.{id_c}"), F.col(f"o.{id_c}")).alias("id1"),
                    F.greatest(F.col(f"a.{id_c}"), F.col(f"o.{id_c}")).alias("id2"),
                )
            )
            cands = intra.unionByName(cross).distinct()
        else:
            cands = intra.distinct()

        # candidate-only verification: gram sets for the batch docs plus
        # ONLY the corpus docs named by a candidate (semi-join before any
        # tokenization — the old side never tokenizes the whole corpus)
        new_grams = doc_ngram_sets(batch, self.text_col, id_c)
        cand_ids = (
            cands.select(F.col("id1").alias(id_c))
            .unionByName(cands.select(F.col("id2").alias(id_c)))
            .distinct()
        )
        old_grams = doc_ngram_sets(
            corpus.join(cand_ids, on=id_c, how="left_semi"),
            self.text_col,
            id_c,
        )
        # a doc can appear on both sides (batch doc already in the corpus
        # store). When the texts agree the rows are identical; when they
        # DIVERGE (a CDC update re-delivering an id with new text while
        # the store still holds the old row, or vice versa) the batch side
        # must win deterministically — max_by on an explicit side priority,
        # never first() over a nondeterministic union order.
        grams = (
            new_grams.withColumn("__prio", F.lit(1))
            .unionByName(old_grams.withColumn("__prio", F.lit(0)))
            .groupBy(id_c)
            .agg(F.max_by("grams", "__prio").alias("grams"))
        )
        g1 = grams.select(F.col(id_c).alias("id1"), F.col("grams").alias("__g1"))
        g2 = grams.select(F.col(id_c).alias("id2"), F.col("grams").alias("__g2"))
        verified = (
            cands.join(g1, "id1")
            .join(g2, "id2")
            .withColumn("jaccard", jaccard_from_sets(F.col("__g1"), F.col("__g2")))
            .filter(F.col("jaccard") >= F.lit(self.jaccard_threshold))
            .select("id1", "id2", "jaccard")
        )
        # materialize BEFORE mutating the index (see docstring) —
        # localCheckpoint keeps the pair set distributed (no driver
        # transfer) while detaching it from the state the probe read
        out = verified.localCheckpoint(eager=True)

        seq = 0 if epoch_id is None else int(epoch_id)
        self.view.merge_batch(
            bands.withColumn("seq", F.lit(seq)).withColumn("op", F.lit("upsert")),
            epoch_id=epoch_id,
        )
        bands.unpersist()
        return out


class IncrementalDeduper(LshDedupIndex):
    """LshDedupIndex plus a DISTRIBUTED keep/drop fold — the end-to-end
    "only keep novel documents" pipeline with no driver-side state.

    Policy (deterministic, order-defined):
    1. cross-batch: a batch doc pairing with a doc in the KEPT view (kept
       by an earlier batch) is dropped — first arrival wins;
    2. in-batch: connected components over the verified pairs among the
       surviving batch docs, keep the min-id representative per component
       (exactly ``dedup_corpus``'s policy — a corpus arriving as ONE batch
       keeps the identical set, asserted in tests).

    Kept ids live in a second hash-bucketed view, so the whole fold is
    joins + the existing distributed CC: nothing driver-side, per-batch
    cost scales with the batch and its candidates.
    """

    def __init__(self, spark: SparkSession, path: str, **kwargs):
        super().__init__(spark, path, **kwargs)
        self.kept = MaterializedView(
            spark,
            os.path.join(path, "kept"),
            keys=(self.id_col,),
            seq_col="seq",
            op_col="op",
            delete_op="delete",
        )

    def dedup_batch(
        self,
        batch: DataFrame,
        corpus: DataFrame,
        epoch_id: int | None = None,
    ) -> DataFrame:
        """Detect, fold, index: returns the KEPT rows of ``batch`` (full
        rows, not just ids) and records them in the kept view."""
        from go_pq_cdc_elasticsearch_spark.operators.dedup import (
            connected_components,
        )

        id_c = self.id_col
        pairs = self.process_batch(batch, corpus, epoch_id=epoch_id)

        # 1. cross-batch drop: either pair end that is already kept
        # condemns the OTHER end if it belongs to this batch
        kept_prior = (
            self.kept.read().select(id_c)
            if self.kept.exists() and self.kept._bucket_dirs()
            else None
        )
        surviving = batch
        if kept_prior is not None:
            kp1 = kept_prior.select(F.col(id_c).alias("id1"))
            kp2 = kept_prior.select(F.col(id_c).alias("id2"))
            condemned = (
                pairs.join(kp1, "id1").select(F.col("id2").alias(id_c))
                .unionByName(
                    pairs.join(kp2, "id2").select(F.col("id1").alias(id_c))
                )
                .distinct()
            )
            surviving = batch.join(condemned, on=id_c, how="left_anti")

        # 2. in-batch fold: CC over pairs whose BOTH ends survived, keep
        # min id per component (the batch-pipeline policy)
        surv_ids = surviving.select(id_c)
        s1 = surv_ids.select(F.col(id_c).alias("id1"))
        s2 = surv_ids.select(F.col(id_c).alias("id2"))
        intra_pairs = pairs.join(s1, "id1").join(s2, "id2").select("id1", "id2")
        comp = connected_components(intra_pairs)
        drop = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_c)
        )
        # pin the result BEFORE the kept-view merge rewrites the bucket
        # files the lazy kept_prior read depends on — a caller executing
        # the returned frame after the merge would otherwise see this
        # batch's own kept ids as "prior" and re-condemn against them
        kept_batch = surviving.join(drop, on=id_c, how="left_anti").localCheckpoint(
            eager=True
        )

        seq = 0 if epoch_id is None else int(epoch_id)
        self.kept.merge_batch(
            kept_batch.select(id_c)
            .withColumn("seq", F.lit(seq))
            .withColumn("op", F.lit("upsert")),
            epoch_id=epoch_id,
        )
        return kept_batch


def greedy_keep_filter(pairs_by_batch, batch_ids_in_order):
    """Reference policy fold (driver-side over SMALL per-batch id lists in
    tests/examples; a production pipeline expresses the same fold as an
    anti-join per batch): first arrival wins — a doc is dropped iff it
    pairs with a KEPT earlier doc (within-batch ties: lower id wins).

    ``pairs_by_batch``: list of [(id1, id2), ...] per batch (id1 < id2);
    ``batch_ids_in_order``: list of [doc ids] per batch in arrival order.
    Returns the kept-id set.
    """
    kept: set = set()
    for pairs, ids in zip(pairs_by_batch, batch_ids_in_order):
        adj: dict = {}
        for x, y in pairs:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        for doc in sorted(ids):
            if not any(nb in kept for nb in adj.get(doc, ())):
                kept.add(doc)
    return kept
