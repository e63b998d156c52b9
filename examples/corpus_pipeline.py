"""End-to-end training-corpus preparation pipeline — the LLM-data story
this engine adds on top of the reference's CDC surface, composed from the
first-class operators:

    documents
      -> text analysis   (tokens, quality score, language id, fingerprint)
      -> quality filter  (pure column predicate — pushes into the scan)
      -> exact dedup     (md5 fingerprint groupBy; shuffles 16-byte keys)
      -> near-dup removal (MinHash/LSH -> Jaccard verify -> connected comps)
      -> stratified sample (deterministic md5 thresholds per language)
      -> sequence packing (token-budget pack ids per source shard)
      -> parquet shards   (repartitioned by pack bucket before the write)

Every stage is deterministic (md5-derived, no RNG state), so retries and
replays produce byte-identical output. At 100 TB the only shuffles are the
dedup groupBys/joins and the final repartition; analysis, filtering and
sampling are scan-side column work.

Run: python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.functions import text as TX
from go_pq_cdc_elasticsearch_spark.operators import dedup as DD
from go_pq_cdc_elasticsearch_spark.operators import sampling as SA
from go_pq_cdc_elasticsearch_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example-corpus-pipeline", cpus=4)
    out_dir = os.path.join(tempfile.mkdtemp(prefix="ex_corpus_"), "shards")

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1) text analysis — all JVM column expressions, zero Python in the row
    # path; at scale this is free column work fused into the scan stage.
    analyzed = docs.select(
        "doc_id",
        "text",
        "source",
        TX.token_count_ws(F.col("text")).alias("n_tokens"),
        F.round(TX.quality_score(F.col("text")), 6).alias("quality"),
        TX.lang_id(F.col("text")).alias("lang"),
        TX.fingerprint(F.col("text")).alias("fp"),
    )

    # 2) quality gate — plain predicate (predicate-pushdown friendly).
    kept = analyzed.filter((F.col("quality") >= 0.3) & (F.col("n_tokens") >= 5))

    # 3) exact dedup on the content fingerprint (keep the smallest doc_id);
    # exact_dedup returns the surviving ids — semi-join them back so the
    # analysis columns ride along (the shuffle still carries only ids).
    survivors = DD.exact_dedup(kept, text_col="text", id_col="doc_id").select(
        "doc_id"
    )
    exact = kept.join(survivors, on="doc_id", how="left_semi")

    # 4) near-duplicate removal: LSH candidates -> Jaccard verify ->
    # connected components -> drop all but each cluster's min doc_id.
    deduped = DD.dedup_corpus(exact, jaccard_threshold=0.7)
    n_clean = deduped.count()

    # 5) deterministic stratified sampling: downweight the dominant
    # language, keep all of the rest.
    sampled = SA.stratified_hash_sample(
        deduped,
        rates={"en": 0.8, "de": 1.0, "fr": 1.0, "es": 1.0, "und": 1.0},
        strata_col="lang",
        key_cols=["doc_id"],
    )

    # 6) pack into fixed token budgets per source shard.
    packed = SA.pack_sequences(
        sampled, budget=512, token_col="n_tokens",
        order_col="doc_id", partition_col="source",
    )

    # 7) write shards — repartition by the partition column FIRST so each
    # output dir gets one writer, not one sliver per shuffle task.
    packed.repartition(4, "source").write.mode("overwrite").partitionBy(
        "source"
    ).parquet(out_dir)

    back = spark.read.parquet(out_dir)
    print(f"raw={n_raw} after_dedup={n_clean} packed={back.count()}")
    print("per-source pack summary:")
    back.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("pack_id").alias("packs"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("source").show(20, truncate=False)


if __name__ == "__main__":
    main(*sys.argv[1:2])
