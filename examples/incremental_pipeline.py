"""Incremental training-data ingestion — the streaming-era counterpart of
examples/corpus_pipeline.py: new document waves arrive (a crawl drop, a CDC
feed), and the pipeline deduplicates each wave against everything already
ingested WITHOUT recomputing the corpus, while maintaining a live rollup
with approximate-distinct columns:

    wave_i
      -> LshDedupIndex.process_batch   (probe band-bucket index: the state
         read partition-prunes to the buckets the wave hashes into;
         candidates verified with exact n-gram Jaccard, candidate-only)
      -> greedy first-arrival-wins keep/drop fold
      -> ContinuousAggregate.merge_batch (per-source doc counts, token
         sums, and HLL approx-distinct languages — mergeable sketches, so
         the incremental view equals the batch recomputation)

At 100 TB the per-wave cost scales with the wave, not the corpus: the
index probe reads only matching hash buckets, verification touches only
candidates, and the rollup merge rewrites only touched state buckets.

Run: python examples/incremental_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.functions import text as TX
from go_pq_cdc_elasticsearch_spark.session import get_spark
from go_pq_cdc_elasticsearch_spark.streaming.continuous_agg import (
    ContinuousAggregate,
)
from go_pq_cdc_elasticsearch_spark.streaming.incremental_dedup import (
    LshDedupIndex,
    greedy_keep_filter,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example-incremental-pipeline", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="incr_pipe_")

    idx = LshDedupIndex(spark, os.path.join(work, "idx"), jaccard_threshold=0.7)
    rollup = ContinuousAggregate(
        spark,
        os.path.join(work, "rollup"),
        group_cols=["source"],
        sum_cols=["n_tokens"],
        distinct_cols=["lang"],
    )

    pairs_by_wave, ids_by_wave = [], []
    for epoch, m in enumerate((0, 1, 2)):  # three arrival waves
        wave = docs.filter(F.col("doc_id") % 3 == m)
        pairs = idx.process_batch(wave, corpus=docs, epoch_id=epoch)
        pairs_by_wave.append([(r["id1"], r["id2"]) for r in pairs.collect()])
        ids_by_wave.append([r["doc_id"] for r in wave.select("doc_id").collect()])
        kept_now = greedy_keep_filter(pairs_by_wave, ids_by_wave)
        kept_wave = wave.filter(F.col("doc_id").isin(
            [d for d in ids_by_wave[-1] if d in kept_now]
        ))
        enriched = kept_wave.withColumn(
            "n_tokens", TX.token_count_ws(F.col("text"))
        )
        rollup.merge_batch(
            enriched.select("source", "lang", "n_tokens"), epoch_id=epoch
        )
        print(
            f"wave {epoch}: {len(ids_by_wave[-1])} arrived, "
            f"{len(pairs_by_wave[-1])} dup pairs"
        )

    kept = greedy_keep_filter(pairs_by_wave, ids_by_wave)
    print(f"kept {len(kept)} of {docs.count()} docs after incremental dedup")
    print("live rollup (per source):")
    for r in (
        rollup.read()
        .select("source", "n", "sum_n_tokens", "approx_distinct_lang")
        .orderBy("source")
        .collect()
    ):
        print(
            f"  {r['source']}: docs={r['n']} tokens={r['sum_n_tokens']} "
            f"~langs={r['approx_distinct_lang']}"
        )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
