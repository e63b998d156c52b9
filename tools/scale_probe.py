"""Measured scaling study: do the headline operators actually scale the
way the 100 TB design argument claims?

PERF.md argues from plan shape (bucketed candidate generation, partial
aggregation, broadcast small sides). This tool adds MEASURED slopes: it
upscales the sf0.1 tables x1/x4/x16 into /tmp (values derived from the
real testdata, keys remapped per replica so key cardinality scales with
the data and replicas aren't degenerate duplicates of each other), runs
each headline operator at every scale, and reports seconds plus the
log-log slope between the x4 and x16 points (1.0 = linear in rows;
< 1 = fixed overhead still dominates; >> 1 = superlinear red flag).

Replica remapping, per table:
- lineitem: l_orderkey offset per replica (group/join cardinality scales)
- events:   event_id + user_id offset per replica (CDC key space scales)
- documents: doc_id offset; text word-shuffled per replica (seeded) so
  cross-replica pairs are NOT near-dups (the LSH candidate structure
  scales like a real corpus instead of one giant duplicate cluster)
- embeddings: vec_id offset (corpus side of top-k scales; the fixed
  query set comes from the original replica)

Usage: python tools/scale_probe.py [sf_dir] [out_json]
Writes one JSON object with per-probe {scale: sec} maps and slopes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = (1, 4, 16, 64)
ROOT = "/tmp/spark_graft_scale"


def _shuffle_words(text: str, seed: int) -> str:
    """Per-replica seeded word shuffle: destroys nearly all word n-grams,
    so cross-replica pairs are genuinely NOT near-dups and the LSH
    candidate structure scales like a real corpus. (A cyclic word
    ROTATION does the opposite — it preserves all but n-1 shingles, so
    every replica is a true near-dup of its original and clusters of
    size = replica count form: measured, that worst case costs ~1.4x the
    shuffled workload at x16 (26.25 s vs 18.52 s) — a useful skew bound,
    see PERF.md.)"""
    if seed == 0:
        return text
    import random

    w = text.split(" ")
    if len(w) < 2:
        return text
    random.Random(seed).shuffle(w)
    return " ".join(w)


def build(sf_dir: str) -> None:
    from go_pq_cdc_elasticsearch_spark.catalog import table_path

    src = {
        name: pq.read_table(table_path(sf_dir, name))
        for name in ("lineitem", "events", "documents", "embeddings")
    }
    max_ok = pc.max(src["lineitem"].column("l_orderkey")).as_py() + 1
    max_ev = pc.max(src["events"].column("event_id")).as_py() + 1
    max_us = pc.max(src["events"].column("user_id")).as_py() + 1
    max_doc = pc.max(src["documents"].column("doc_id")).as_py() + 1
    max_vec = pc.max(src["embeddings"].column("vec_id")).as_py() + 1

    for scale in SCALES:
        out_dir = os.path.join(ROOT, f"x{scale}")
        os.makedirs(out_dir, exist_ok=True)
        done = os.path.join(out_dir, ".complete")
        # marker records the SOURCE dir: a rerun against a different sf
        # must rebuild, not silently measure the previous source's replicas
        marker = os.path.abspath(sf_dir)
        if os.path.exists(done):
            with open(done) as f:
                if f.read().strip() == marker:
                    continue
            # source mismatch: remove the stale marker BEFORE rebuilding —
            # an interrupted rebuild would otherwise leave the old marker
            # on a mixed-source dir that a later matching run accepts
            os.remove(done)

        def replicas(name, remap):
            parts = []
            for r in range(scale):
                t = src[name]
                parts.append(remap(t, r))
            return pa.concat_tables(parts)

        def shift(t, col, off):
            i = t.schema.get_field_index(col)
            return t.set_column(
                i, col, pc.add(t.column(col), pa.scalar(off, t.column(col).type))
            )

        li = replicas("lineitem", lambda t, r: shift(t, "l_orderkey", r * max_ok))
        ev = replicas(
            "events",
            lambda t, r: shift(
                shift(t, "event_id", r * max_ev), "user_id", r * max_us
            ),
        )

        def doc_remap(t, r):
            t = shift(t, "doc_id", r * max_doc)
            if r == 0:
                return t
            texts = [_shuffle_words(x, r) for x in t.column("text").to_pylist()]
            i = t.schema.get_field_index("text")
            return t.set_column(i, "text", pa.array(texts, pa.string()))

        docs = replicas("documents", doc_remap)
        emb = replicas("embeddings", lambda t, r: shift(t, "vec_id", r * max_vec))

        for name, t in (
            ("lineitem", li),
            ("events", ev),
            ("documents", docs),
            ("embeddings", emb),
        ):
            pq.write_table(t, table_path(out_dir, name))
        with open(done, "w") as f:
            f.write(marker)

    # single-hot-key skew variant of the x16 events: half of all rows
    # collapse onto ONE user_id — the CDC worst case (a runaway-writer
    # table). cdc_apply's window can't be salted by AQE (window partitions
    # are semantic), so this measures the actual hot-partition cost bound
    # rather than assuming AQE saves it.
    skew_dir = os.path.join(ROOT, "x16_skew")
    os.makedirs(skew_dir, exist_ok=True)
    done = os.path.join(skew_dir, ".complete")
    marker = os.path.abspath(sf_dir)
    if not (os.path.exists(done) and open(done).read().strip() == marker):
        if os.path.exists(done):
            os.remove(done)  # same stale-marker rule as the scale dirs
        ev16 = pq.read_table(table_path(os.path.join(ROOT, "x16"), "events"))
        uid = ev16.column("user_id")
        hot = pc.max(uid).as_py() + 1
        skewed = pc.if_else(
            pc.equal(pc.bit_wise_and(ev16.column("event_id"), 1), 0),
            pa.scalar(hot, uid.type),
            uid,
        )
        i = ev16.schema.get_field_index("user_id")
        pq.write_table(
            ev16.set_column(i, "user_id", skewed), table_path(skew_dir, "events")
        )
        with open(done, "w") as f:
            f.write(marker)


XL_SCALE = 256
# exactly 8 words: the paragraph probe chunks text into 8-word lines, so
# prepending these makes the FIRST line of every planted doc the same
# normalized line — one key carrying half the corpus (the cookie-banner /
# license-header shape the de-skewed keep-first decision must absorb)
BOILERPLATE_8W = "all rights reserved this site uses tracking cookies"


def build_xl(sf_dir: str) -> None:
    """x256 replicas of the DEDUP/ANN tables only — documents (word-
    shuffled per replica, same scheme as build()) and embeddings (VERDICT
    r9 item 7). lineitem/events stay capped at x64: their x256 concat
    would hold ~15 GB in driver RAM and the relational/CDC slopes are
    already pinned at x64. Replica-by-replica ParquetWriter append keeps
    the build's memory at one replica."""
    from go_pq_cdc_elasticsearch_spark.catalog import table_path

    out_dir = os.path.join(ROOT, f"x{XL_SCALE}")
    os.makedirs(out_dir, exist_ok=True)
    done = os.path.join(out_dir, ".complete")
    marker = os.path.abspath(sf_dir)
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == marker:
                return
        os.remove(done)

    def shift(t, col, off):
        i = t.schema.get_field_index(col)
        return t.set_column(
            i, col, pc.add(t.column(col), pa.scalar(off, t.column(col).type))
        )

    docs = pq.read_table(table_path(sf_dir, "documents"))
    emb = pq.read_table(table_path(sf_dir, "embeddings"))
    max_doc = pc.max(docs.column("doc_id")).as_py() + 1
    max_vec = pc.max(emb.column("vec_id")).as_py() + 1
    w = pq.ParquetWriter(table_path(out_dir, "documents"), docs.schema)
    try:
        for r in range(XL_SCALE):
            t = shift(docs, "doc_id", r * max_doc)
            if r:
                texts = [
                    _shuffle_words(x, r) for x in t.column("text").to_pylist()
                ]
                i = t.schema.get_field_index("text")
                t = t.set_column(i, "text", pa.array(texts, pa.string()))
            w.write_table(t)
    finally:
        w.close()
    w = pq.ParquetWriter(table_path(out_dir, "embeddings"), emb.schema)
    try:
        for r in range(XL_SCALE):
            w.write_table(shift(emb, "vec_id", r * max_vec))
    finally:
        w.close()
    with open(done, "w") as f:
        f.write(marker)


def build_docskew() -> None:
    """x16 documents with the 8-word boilerplate line planted at the head
    of ~50% of docs (VERDICT r9 item 3's skew probe input): after the
    paragraph probe's 8-word chunking, every planted doc's first line is
    the SAME normalized line — the single-hot-key regime the r10
    min-aggregate keep-first decision must keep flat vs clean."""
    from go_pq_cdc_elasticsearch_spark.catalog import table_path

    src = table_path(os.path.join(ROOT, "x16"), "documents")
    out_dir = os.path.join(ROOT, "x16_docskew")
    os.makedirs(out_dir, exist_ok=True)
    done = os.path.join(out_dir, ".complete")
    marker = os.path.abspath(src)
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == marker:
                return
        os.remove(done)
    t = pq.read_table(src)
    ids = t.column("doc_id").to_pylist()
    texts = [
        (BOILERPLATE_8W + " " + x) if (i % 2 == 0 and x) else x
        for i, x in zip(ids, t.column("text").to_pylist())
    ]
    i = t.schema.get_field_index("text")
    pq.write_table(
        t.set_column(i, "text", pa.array(texts, pa.string())),
        table_path(out_dir, "documents"),
    )
    with open(done, "w") as f:
        f.write(marker)


class _RssSampler:
    """Peak memory during a probe window (VERDICT r6 item 8): samples
    current RSS of the Python driver process and of the Spark JVM
    (separately — see __init__) every 50 ms in a daemon thread, keeping
    the window max of each. /proc VmHWM can't serve here — it is a
    process-lifetime high-water mark, so per-probe peaks need
    current-RSS sampling. The claim under test: driver-side state of the
    dedup/ANN paths is BOUNDED (fixed training samples, centroid
    matrices, distinct bucket ids), so the PYTHON driver peak stays flat
    while the DATA scales x16 -> x64."""

    def __init__(self) -> None:
        import threading

        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        # SEPARATE peaks: in local mode the JVM holds the executors too,
        # so its RSS legitimately grows with data (cache/shuffle
        # buffers) — the bounded-driver-state claim is about the PYTHON
        # driver process (centroids, samples, collect()s), which must
        # stay flat. Conflating them made "flat" unfalsifiable.
        self.peak_py_mb = 0.0
        self.peak_jvm_mb = 0.0
        jvms = self._jvm_descendants()
        # a sampler that silently measured only the ~constant Python RSS
        # would make the flatness gate pass vacuously (review r6): the
        # caller must see — and report — that the JVM wasn't found
        self.jvm_found = bool(jvms)
        self._py_pid = os.getpid()
        self._jvm_pids = jvms

    @staticmethod
    def _stat_fields(pid: int) -> tuple[str, int] | None:
        """(comm, ppid) from /proc/<pid>/stat, parsing comm between the
        first '(' and LAST ')' — a naive split() breaks on comms with
        spaces and would misread every later field."""
        try:
            with open(f"/proc/{pid}/stat") as f:
                raw = f.read()
            lp, rp = raw.index("("), raw.rindex(")")
            comm = raw[lp + 1 : rp]
            rest = raw[rp + 2 :].split()
            return comm, int(rest[1])  # rest: state ppid ...
        except (OSError, ValueError, IndexError):
            return None

    @classmethod
    def _jvm_descendants(cls) -> list[int]:
        """Every java process whose ancestry chain reaches this process —
        not just direct children (a spark-submit wrapper that doesn't
        exec() puts the JVM one level deeper)."""
        me = os.getpid()
        info: dict[int, tuple[str, int]] = {}
        for d in os.listdir("/proc"):
            if d.isdigit():
                got = cls._stat_fields(int(d))
                if got is not None:
                    info[int(d)] = got
        out = []
        for pid, (comm, _) in info.items():
            if "java" not in comm:
                continue
            cur, hops = pid, 0
            while cur > 1 and hops < 64:
                if cur == me:
                    out.append(pid)
                    break
                parent = info.get(cur)
                if parent is None:
                    break
                cur, hops = parent[1], hops + 1
        return out

    @staticmethod
    def _rss_mb(pid: int) -> float:
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1]) / 1024.0
        except (OSError, ValueError):
            pass
        return 0.0

    def _sample(self) -> None:
        py = self._rss_mb(self._py_pid)
        jvm = sum(self._rss_mb(p) for p in self._jvm_pids)
        if py > self.peak_py_mb:
            self.peak_py_mb = py
        if jvm > self.peak_jvm_mb:
            self.peak_jvm_mb = jvm

    def _run(self) -> None:
        while not self._stop.is_set():
            self._sample()
            self._stop.wait(0.05)

    def __enter__(self) -> "_RssSampler":
        import threading

        # synchronous first sample: a probe faster than the first 50 ms
        # tick must not record peak 0 (review r6)
        self._sample()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)


def probes(spark):
    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.operators.cdc import cdc_apply
    from go_pq_cdc_elasticsearch_spark.operators.dedup import (
        dedup_corpus,
        exact_dedup,
    )
    from go_pq_cdc_elasticsearch_spark.operators.similarity import (
        brute_force_topk,
    )

    def tpch_q1(dfs):
        li = dfs["lineitem"]
        return (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity"),
                F.sum("l_extendedprice"),
                F.avg("l_discount"),
                F.count(F.lit(1)),
            )
        )

    def cdc(dfs):
        return cdc_apply(dfs["events"])

    def exact(dfs):
        return exact_dedup(dfs["documents"])

    def neardup(dfs):
        return dedup_corpus(dfs["documents"]).agg(F.count(F.lit(1)))

    def topk(dfs):
        qs = dfs["embeddings_q"]
        return brute_force_topk(dfs["embeddings"], qs, k=5)

    def paragraph(dfs):
        return _paragraph_dedup_counts(dfs["documents"])

    return {
        "tpch_q1_scan_agg": tpch_q1,
        "cdc_apply": cdc,
        "exact_dedup": exact,
        "neardup_corpus": neardup,
        "cosine_topk_corpus_side": topk,
        "paragraph_dedup": paragraph,
    }


def _paragraph_dedup_counts(docs_df):
    """q_l20's corpus shape: chunk words into 8-word lines (the synthetic
    docs ship as single lines), run the full reassembling line dedup,
    reduce to corpus totals (the probe measures the op, not the output
    transfer)."""
    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.functions import text as TX
    from go_pq_cdc_elasticsearch_spark.operators.dedup import paragraph_dedup

    w = TX.words(F.col("text"))
    paras = F.transform(
        F.sequence(
            F.lit(0), (F.ceil(F.size(w) / F.lit(8.0))).cast("int") - 1
        ),
        lambda i: F.concat_ws(" ", F.slice(w, i * 8 + 1, 8)),
    )
    structured = docs_df.select(
        "doc_id", F.concat_ws("\n", paras).alias("text")
    )
    return paragraph_dedup(structured).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_kept").alias("kept_lines"),
    )


def xl_probes(spark):
    """The dedup/ANN paths pushed to x256 (VERDICT r9 item 7): each is the
    operator's 100 TB shape — bucketed candidate generation, bounded
    driver state — measured at x64 and x256 for the tail slope. One rep
    per scale: these run minutes, where host-steal noise is
    proportionally small."""
    import tempfile

    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.operators.dedup import dedup_corpus
    from go_pq_cdc_elasticsearch_spark.operators.similarity import (
        semantic_dedup,
    )
    from go_pq_cdc_elasticsearch_spark.streaming.incremental_dedup import (
        LshDedupIndex,
    )

    def neardup(dfs):
        return dedup_corpus(dfs["documents"]).agg(F.count(F.lit(1)))

    def incremental(dfs):
        # two out-of-order waves against a FRESH index (q_lx5's shape);
        # the index build, pruned probes and candidate-only verification
        # are all inside the timed window
        work = tempfile.mkdtemp(prefix="probe_inc_", dir=ROOT)
        docs = dfs["documents"]
        idx = LshDedupIndex(
            spark, os.path.join(work, "idx"), jaccard_threshold=0.7
        )
        parts = [
            idx.process_batch(
                docs.filter(F.col("doc_id") % 2 == m),
                corpus=docs,
                epoch_id=i,
                eager=False,
            )
            for i, m in enumerate((1, 0))
        ]
        return parts[0].unionByName(parts[1]).agg(F.count(F.lit(1)))

    def semantic(dfs):
        # approx config with cells grown ~ N/100 — the documented scale
        # story (cells of bounded size keep the quadratic step bounded).
        # 100, not 500: within-cell all-pairs materializes ~cell_size/2
        # array-pair rows per vector, and 500-vector cells measured 537 s
        # at x64 (64M pair rows) — the slope is the claim under test, so
        # keep the constant in the regime a real deployment would run
        emb = dfs["embeddings"].select("vec_id", "embedding")
        n = emb.count()
        k = max(4, n // 100)
        return semantic_dedup(emb, tau=0.99, n_centroids=k).agg(
            F.count(F.lit(1))
        )

    return {
        "neardup_corpus_xl": neardup,
        "incremental_dedup_xl": incremental,
        "semantic_dedup_approx_xl": semantic,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe.json"
    # the x256 corpus probes hold multi-GB persisted gram sets next to
    # sort/broadcast buffers in ONE local-mode JVM — the engine's default
    # 16g heap OOMed building a verify-join broadcast at x256 (r10). A
    # probe box has the RAM (the target fleet certainly does); only a
    # caller's explicit setting overrides this.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    build(sf_dir)

    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.catalog import load_table
    from go_pq_cdc_elasticsearch_spark.session import get_spark

    spark = get_spark("scale_probe")
    results: dict[str, dict] = {}
    for scale in SCALES:
        d = os.path.join(ROOT, f"x{scale}")
        dfs = {
            name: load_table(spark, d, name)
            for name in ("lineitem", "events", "documents", "embeddings")
        }
        # fixed query set: 25 vectors from the ORIGINAL replica, so only
        # the corpus side of top-k scales (the realistic shape: corpus
        # >> query batch)
        dfs["embeddings_q"] = (
            load_table(spark, os.path.join(ROOT, "x1"), "embeddings")
            .orderBy("vec_id")
            .limit(25)
        )
        for name, fn in probes(spark).items():
            best = None
            peak_py = peak_jvm = 0.0
            jvm_found = True
            for _ in range(2):  # min-of-2: host-steal damping
                with _RssSampler() as rss:
                    t0 = time.time()
                    fn(dfs).collect()
                    dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                peak_py = max(peak_py, rss.peak_py_mb)
                peak_jvm = max(peak_jvm, rss.peak_jvm_mb)
                jvm_found = jvm_found and rss.jvm_found
            results.setdefault(name, {})[f"x{scale}"] = round(best, 2)
            results[name][f"x{scale}_py_driver_rss_mb"] = round(peak_py)
            if jvm_found:
                results[name][f"x{scale}_jvm_rss_mb"] = round(peak_jvm)
            else:
                # never let a missing JVM read as a flat JVM (review r6)
                results[name][f"x{scale}_jvm_rss_mb_missing"] = True
            print(
                f"x{scale} {name}: {best:.2f}s py {peak_py:.0f}MB "
                f"jvm {peak_jvm:.0f}MB",
                file=sys.stderr,
            )

    # skew probe: cdc_apply on the single-hot-key x16 variant, reported as
    # a ratio vs the clean x16 run (the window hot-partition cost bound)
    skew_dfs = {
        "events": load_table(spark, os.path.join(ROOT, "x16_skew"), "events")
    }
    best = None
    for _ in range(2):
        t0 = time.time()
        probes(spark)["cdc_apply"](skew_dfs).collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    results["cdc_apply_skew_hotkey"] = {"x16_skew": round(best, 2)}
    clean = results.get("cdc_apply", {}).get("x16")
    # is-not-None + epsilon, not truthiness: a run rounding to 0.0 would
    # silently drop the headline ratio/slope fields (review r5)
    if clean is not None and clean > 1e-9:
        results["cdc_apply_skew_hotkey"]["ratio_vs_clean_x16"] = round(
            best / clean, 2
        )
    print(f"x16_skew cdc_apply: {best:.2f}s", file=sys.stderr)

    # paragraph_dedup skew probe (VERDICT r9 item 3): one boilerplate line
    # planted in ~50% of the x16 docs — the keep-first decision must stay
    # flat vs the clean x16 run (partial aggregation absorbs the hot key;
    # the pre-r10 row_number window funneled it into one task)
    build_docskew()
    skew_docs = {
        "documents": load_table(
            spark, os.path.join(ROOT, "x16_docskew"), "documents"
        )
    }
    best = None
    for _ in range(2):
        t0 = time.time()
        probes(spark)["paragraph_dedup"](skew_docs).collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    results["paragraph_dedup_skew_hotline"] = {"x16_skew": round(best, 2)}
    clean = results.get("paragraph_dedup", {}).get("x16")
    if clean is not None and clean > 1e-9:
        results["paragraph_dedup_skew_hotline"]["ratio_vs_clean_x16"] = round(
            best / clean, 2
        )
    print(f"x16_docskew paragraph_dedup: {best:.2f}s", file=sys.stderr)

    # x256 tail slopes for the dedup/ANN paths (VERDICT r9 item 7)
    build_xl(sf_dir)
    for scale in (64, XL_SCALE):
        d = os.path.join(ROOT, f"x{scale}")
        dfs = {
            name: load_table(spark, d, name)
            for name in ("documents", "embeddings")
        }
        for name, fn in xl_probes(spark).items():
            with _RssSampler() as rss:
                t0 = time.time()
                fn(dfs).collect()
                dt = time.time() - t0
            results.setdefault(name, {})[f"x{scale}"] = round(dt, 2)
            results[name][f"x{scale}_py_driver_rss_mb"] = round(rss.peak_py_mb)
            if rss.jvm_found:
                results[name][f"x{scale}_jvm_rss_mb"] = round(rss.peak_jvm_mb)
            else:
                results[name][f"x{scale}_jvm_rss_mb_missing"] = True
            print(
                f"x{scale} {name}: {dt:.2f}s py {rss.peak_py_mb:.0f}MB "
                f"jvm {rss.peak_jvm_mb:.0f}MB",
                file=sys.stderr,
            )

    import math

    def _slope(lo, hi):
        if lo is None or hi is None:
            return None  # probe didn't run at these scales
        if lo <= 1e-9 or hi <= 1e-9:
            print(f"slope skipped (timing ~0): {lo} -> {hi}", file=sys.stderr)
            return None
        return round(math.log(hi / lo) / math.log(4.0), 2)

    for name, r in results.items():
        s = _slope(r.get("x4"), r.get("x16"))
        if s is not None:
            r["slope_x4_x16"] = s
        s = _slope(r.get("x16"), r.get("x64"))
        if s is not None:
            r["slope_x16_x64"] = s
        s = _slope(r.get("x64"), r.get(f"x{XL_SCALE}"))
        if s is not None:
            r["slope_x64_x256"] = s
        # driver-memory flatness: PYTHON driver peak at x64 over x16 —
        # bounded driver-side state must stay ~1.0; a data-scaled driver
        # structure would show ~4.0. The JVM ratio is reported for
        # context only (in local mode it contains the executors, whose
        # cache/shuffle buffers legitimately grow with data).
        lo, hi = r.get("x16_py_driver_rss_mb"), r.get("x64_py_driver_rss_mb")
        if lo and hi:
            r["py_rss_ratio_x16_x64"] = round(hi / lo, 2)
        lo, hi = r.get("x16_jvm_rss_mb"), r.get("x64_jvm_rss_mb")
        if lo and hi:
            r["jvm_rss_ratio_x16_x64"] = round(hi / lo, 2)
        lo, hi = (
            r.get("x64_py_driver_rss_mb"),
            r.get(f"x{XL_SCALE}_py_driver_rss_mb"),
        )
        if lo and hi:
            r["py_rss_ratio_x64_x256"] = round(hi / lo, 2)
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
