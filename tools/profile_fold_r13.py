"""Round-13 fold-construction profiler: splits each EXT fold part's wall
into (build, canon-summary construction, execute) phases, single-threaded,
and optionally cProfiles the warm cycle to attribute driver-side time to
Python tree building vs py4j socket waits (the GIL question from VERDICT
r12 item 1).

Usage: python tools/profile_fold_r13.py [--profile] [part ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PROBE_RUNS (default 2).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_pq_cdc_elasticsearch_spark.session import get_spark  # noqa: E402
from go_pq_cdc_elasticsearch_spark.sql import EXT_REGISTRY  # noqa: E402
from go_pq_cdc_elasticsearch_spark.sql.canon import spark_canon_summary  # noqa: E402
from go_pq_cdc_elasticsearch_spark.sql.ext_combo import (  # noqa: E402
    SX1_PARTS,
    SX2_PARTS,
    SX3_PARTS,
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_profile = "--profile" in sys.argv
    parts = args or (SX1_PARTS + SX2_PARTS + SX3_PARTS)
    unknown = [p for p in parts if p not in EXT_REGISTRY]
    if unknown:
        print(f"unknown parts: {unknown}", file=sys.stderr)
        return 2
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2")))

    spark = get_spark("profile_fold_r13")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def cycle(collect_rows: bool = True):
        per = {}
        for name in parts:
            t0 = time.perf_counter()
            df = EXT_REGISTRY[name].spark(spark, sf_dir)
            t1 = time.perf_counter()
            summ = spark_canon_summary(df, name)
            t2 = time.perf_counter()
            if collect_rows:
                summ.collect()
            t3 = time.perf_counter()
            per[name] = (t1 - t0, t2 - t1, t3 - t2)
        return per

    # cold cycle (codegen/JIT warmup), then measured warm cycles (minima)
    cycle()
    best: dict[str, tuple] = {}
    for _ in range(n_runs):
        for name, t in cycle().items():
            b = best.get(name)
            best[name] = t if b is None else tuple(min(a, c) for a, c in zip(b, t))

    tot_b = tot_c = tot_e = 0.0
    print(f"{'part':30s} {'build':>8s} {'canon':>8s} {'exec':>8s}")
    for name in sorted(best, key=lambda n: -(best[n][0] + best[n][1])):
        b, c, e = best[name]
        tot_b += b
        tot_c += c
        tot_e += e
        print(f"{name:30s} {b:8.3f} {c:8.3f} {e:8.3f}")
    print(
        f"{'TOTAL (warm, serial)':30s} {tot_b:8.3f} {tot_c:8.3f} {tot_e:8.3f}"
    )

    if do_profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        cycle()
        pr.disable()
        st = pstats.Stats(pr)
        st.sort_stats("cumulative")
        print("\n=== top 40 by cumulative ===")
        st.print_stats(40)
        print("\n=== top 40 by internal time ===")
        st.sort_stats("tottime")
        st.print_stats(40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
