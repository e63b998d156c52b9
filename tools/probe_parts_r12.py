"""Round-12 instrumentation: standalone wall + Spark-job-count per EXT (or
declared) query, best over N interleaved rounds — the per-part view the
q_sx fold walls are made of. Job counts come from the status tracker's
job-id delta around each run (AQE stage materializations included), which
is weather-proof evidence: a job-count drop is structural, not a timing.

Usage: python tools/probe_parts_r12.py [pattern ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PROBE_RUNS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_pq_cdc_elasticsearch_spark.session import get_spark  # noqa: E402
from go_pq_cdc_elasticsearch_spark.sql import EXT_REGISTRY, REGISTRY  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pats = sys.argv[1:]
    known = {**REGISTRY, **EXT_REGISTRY}
    names = sorted(n for n in known if not pats or any(p in n for p in pats))
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))

    spark = get_spark("probe_parts_r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    import bench

    bench._warm_streaming(spark, sf_dir)

    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else 0

    best: dict[str, float] = {}
    jobs: dict[str, int] = {}
    for r in range(n_runs):
        for name in names:
            q = known[name]
            spark.sparkContext.setJobDescription(name)
            j0 = n_jobs()
            t0 = time.time()
            try:
                df = q.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                nj = n_jobs() - j0
                best[name] = min(best.get(name, 1e9), dt)
                jobs[name] = nj
                print(f"[{dt:7.2f}] jobs={nj:3d} run{r} {name}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[ FAIL ] run{r} {name}: {e}", flush=True)
            spark.sparkContext.setJobDescription(None)
    total = sum(best.values())
    print(f"== best-of-{n_runs} total {total:.2f}s over {len(best)} queries ==")
    for name in sorted(best, key=lambda n: -best[n]):
        print(f"  {best[name]:7.2f}  jobs={jobs.get(name, -1):3d}  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
