"""Compaction probe (r11, VERDICT r10 item 1): is probe wall governed by
SEGMENT COUNT, and does compact() flatten it?

The band segment index appends one file per touched bucket per indexed
batch; at months of micro-batches the listing + parquet footer reads —
not the band-row volume — dominate probe cost. This probe measures it
directly on a fixed row volume:

1. index the same document set as ONE batch (few segments) — baseline;
2. re-stage the identical band rows as MANY appends (segment count grows
   ~N×, row count identical up to duplicate-tolerant reads);
3. time the cross-batch probe (pruned state read + candidate join +
   count) fragmented vs compacted;
4. same axis for the corpus store: per-epoch dirs vs one consolidated
   dir, timing the explicit-path-list read the foreachBatch writer does.

Writes one JSON object to tools/probe_compact_r11.json with wall times,
file counts, and the fragmented/compacted ratios.

Usage: python tools/probe_compact_r11.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_compact_r11.json")
)
N_APPENDS = 48  # simulated micro-batches, all carrying the same band rows


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.catalog import load_table
    from go_pq_cdc_elasticsearch_spark.operators.dedup import minhash_band_rows
    from go_pq_cdc_elasticsearch_spark.streaming.incremental_dedup import (
        LshDedupIndex,
        consolidate_corpus_epochs,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SF_DIR, "documents")
    probe_docs = docs.filter(F.col("doc_id") % 7 == 0).localCheckpoint(eager=True)
    work = tempfile.mkdtemp(prefix="probe_compact_")
    result: dict = {"sf_dir": SF_DIR, "n_appends": N_APPENDS}

    def probe_wall(idx) -> float:
        bands = minhash_band_rows(probe_docs, "text", "doc_id", idx.k, idx.bands)
        t0 = time.monotonic()
        state = idx._indexed_bands(bands)
        n = (
            bands.alias("a")
            .join(
                state.alias("o"),
                (F.col("a.band_idx") == F.col("o.band_idx"))
                & (F.col("a.band_hash") == F.col("o.band_hash")),
            )
            .count()
        )
        wall = time.monotonic() - t0
        assert n > 0
        return wall

    # -- band index: fragmented vs compacted -------------------------------
    idx = LshDedupIndex(spark, os.path.join(work, "idx"), n_buckets=64)
    bands = minhash_band_rows(docs, "text", "doc_id", idx.k, idx.bands).localCheckpoint(
        eager=True
    )
    for e in range(N_APPENDS):
        idx.view.append_batch(bands, epoch_id=e)
    frag_files = sum(idx.view.segment_counts().values())
    # warm the JVM/file cache once so both sides measure steady state
    probe_wall(idx)
    frag_wall = min(probe_wall(idx) for _ in range(3))
    t0 = time.monotonic()
    idx.compact()
    compact_wall = time.monotonic() - t0
    comp_files = sum(idx.view.segment_counts().values())
    probe_wall(idx)
    comp_wall = min(probe_wall(idx) for _ in range(3))
    result["band_index"] = {
        "fragmented_files": frag_files,
        "compacted_files": comp_files,
        "probe_sec_fragmented": round(frag_wall, 3),
        "probe_sec_compacted": round(comp_wall, 3),
        "speedup": round(frag_wall / comp_wall, 2),
        "compact_sec": round(compact_wall, 3),
    }

    # -- corpus store: per-epoch dirs vs consolidated -----------------------
    corpus = os.path.join(work, "corpus")
    per_epoch = docs.limit(2000).localCheckpoint(eager=True)
    for e in range(N_APPENDS):
        per_epoch.write.mode("overwrite").parquet(os.path.join(corpus, f"epoch={e}"))

    def corpus_read_wall() -> float:
        dirs = sorted(
            os.path.join(corpus, n)
            for n in os.listdir(corpus)
            if n.startswith("epoch=")
        )
        t0 = time.monotonic()
        n = spark.read.parquet(*dirs).count()
        wall = time.monotonic() - t0
        assert n > 0
        return wall

    corpus_read_wall()
    frag_corpus_wall = min(corpus_read_wall() for _ in range(3))
    n_merged = consolidate_corpus_epochs(spark, corpus, upto_seq=N_APPENDS)
    corpus_read_wall()
    comp_corpus_wall = min(corpus_read_wall() for _ in range(3))
    result["corpus_store"] = {
        "epoch_dirs_before": N_APPENDS,
        "merged": n_merged,
        "read_sec_fragmented": round(frag_corpus_wall, 3),
        "read_sec_consolidated": round(comp_corpus_wall, 3),
        "speedup": round(frag_corpus_wall / comp_corpus_wall, 2),
    }

    shutil.rmtree(work, ignore_errors=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
