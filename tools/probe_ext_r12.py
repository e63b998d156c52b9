"""Round-12 EXT-part probe: serial per-part noop-sink timings for named
EXT_REGISTRY entries (the q_sx fold parts run concurrently in the bench,
so their fold numbers are latency-under-contention; this measures each
part's own compute in isolation, same methodology as bench.py run_one).

Usage: python tools/probe_ext_r12.py [name ...]   (default: the heavy set)
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PROBE_RUNS (default 2).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_pq_cdc_elasticsearch_spark.session import get_spark  # noqa: E402
from go_pq_cdc_elasticsearch_spark.sql import EXT_REGISTRY, REGISTRY  # noqa: E402

HEAVY = [
    "q_s23_pivot",
    "q_s26_percentile",
    "q_s36_array_advanced",
    "q_s39_tpch_q5_style",
    "q_s42_tpch_q10_style",
    "q_s45_range_join",
    "q_s48_histogram_moments",
    "q_l7_simhash",
    "q_l18_mixture_sample",
    "q_l24_bm25",
    "q_lx1_ann_ivf",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEAVY
    # clamped (ADVICE r12): SPARK_GRAFT_PROBE_RUNS=0 crashed the minima
    # print on an empty dict after a full Spark startup
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2")))
    known = {**REGISTRY, **EXT_REGISTRY}
    unknown = [n for n in names if n not in known]
    if unknown:
        # validate BEFORE Spark startup (ADVICE r12): a typo'd argv name
        # raised a bare KeyError mid-run after warm-up
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("probe_ext_r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    mins: dict[str, float] = {}
    for r in range(n_runs):
        for name in names:
            q = known[name]
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            q.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            mins[name] = min(mins.get(name, 1e9), dt)
            print(f"[run{r}] {name:28s} {dt:7.2f}s", flush=True)
    print("--- minima ---")
    for name in names:
        print(f"{name:28s} {mins[name]:7.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
