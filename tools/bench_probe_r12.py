"""Round-12 measurement harness: per-query live timings for the declared
suite (same methodology as bench.py — noop sink, warm session) with
progress printed per query so a stall is attributable. Not a bench
replacement; optimization-round instrumentation only.

Usage: python tools/bench_probe_r12.py [pattern ...]
  pattern: only run queries whose name contains any pattern substring.
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PROBE_RUNS (default 2).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_pq_cdc_elasticsearch_spark.session import get_spark  # noqa: E402
from go_pq_cdc_elasticsearch_spark.sql import REGISTRY  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pats = sys.argv[1:]
    names = sorted(
        n for n in REGISTRY if not pats or any(p in n for p in pats)
    )
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))

    spark = get_spark("bench_probe_r12")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    print(f"[{time.time() - t0:7.2f}] session+first action", flush=True)

    if not pats or any("t" in p for p in pats):
        import bench

        t0 = time.time()
        bench._warm_streaming(spark, sf_dir)
        print(f"[{time.time() - t0:7.2f}] streaming warmup", flush=True)

    best: dict[str, float] = {}
    for r in range(n_runs):
        for name in names:
            q = REGISTRY[name]
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            try:
                df = q.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best[name] = min(best.get(name, 1e9), dt)
                print(f"[{dt:7.2f}] run{r} {name}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[ FAIL ] run{r} {name}: {e}", flush=True)
            spark.sparkContext.setJobDescription(None)
    total = sum(best.values())
    print(f"== best-of-{n_runs} total {total:.2f}s over {len(best)} queries ==")
    for name in sorted(best, key=lambda n: -best[n]):
        print(f"  {best[name]:7.2f}  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
