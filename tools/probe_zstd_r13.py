"""Round-13 probe (VERDICT r12 item 6): record the actual §6 evidence for
the zstd parquet default — bytes written and wall for the SAME view merge
under snappy vs zstd, interleaved trials. Writes probe_zstd_r13.json.

Usage: python tools/probe_zstd_r13.py  [n_trials_per_codec]
Env: SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_pq_cdc_elasticsearch_spark.session import get_spark  # noqa: E402


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("probe_zstd_r13")
    spark.sparkContext.setLogLevel("ERROR")

    from go_pq_cdc_elasticsearch_spark.catalog import load_table
    from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView

    events = load_table(spark, sf_dir, "events")
    results: dict[str, dict] = {
        "snappy": {"wall": [], "bytes": [], "files": []},
        "zstd": {"wall": [], "bytes": [], "files": []},
    }
    key = "spark.sql.parquet.compression.codec"
    old = spark.conf.get(key)
    try:
        for _trial in range(n):
            for codec in ("snappy", "zstd"):  # interleaved
                spark.conf.set(key, codec)
                work = tempfile.mkdtemp(prefix=f"zstd_probe_{codec}_")
                try:
                    view = MaterializedView(
                        spark,
                        os.path.join(work, "view"),
                        keys=("user_id",),
                        seq_col="event_id",
                        op_col="event_type",
                        delete_op="delete",
                    )
                    t0 = time.perf_counter()
                    view.merge_batch(events)
                    wall = time.perf_counter() - t0
                    nbytes = _du(view.path)
                    nfiles = sum(
                        len(fs) for _r, _d, fs in os.walk(view.path)
                    )
                    results[codec]["wall"].append(round(wall, 3))
                    results[codec]["bytes"].append(nbytes)
                    results[codec]["files"].append(nfiles)
                finally:
                    shutil.rmtree(work, ignore_errors=True)
    finally:
        spark.conf.set(key, old)

    # second surface: a BULK parquet write (full events table, every
    # column) — the staging/bucketed-table write shape, much more data
    # than the LWW view's post-merge state
    bulk: dict[str, dict] = {}
    try:
        for codec in ("snappy", "zstd"):
            spark.conf.set(key, codec)
            walls, nbytes = [], 0
            for _trial in range(2):
                work = tempfile.mkdtemp(prefix=f"zstd_bulk_{codec}_")
                try:
                    t0 = time.perf_counter()
                    events.repartition(8).write.mode("overwrite").parquet(
                        os.path.join(work, "out")
                    )
                    walls.append(round(time.perf_counter() - t0, 3))
                    nbytes = _du(os.path.join(work, "out"))
                finally:
                    shutil.rmtree(work, ignore_errors=True)
            bulk[codec] = {"wall_min_sec": min(walls), "bytes": nbytes}
    finally:
        spark.conf.set(key, old)

    out = {"sf_dir": sf_dir, "trials_per_codec": n, "bulk_events_write": bulk}
    if len(bulk) == 2:
        out["bulk_zstd_bytes_over_snappy"] = round(
            bulk["zstd"]["bytes"] / bulk["snappy"]["bytes"], 4
        )
        out["bulk_zstd_wall_over_snappy_min"] = round(
            bulk["zstd"]["wall_min_sec"] / bulk["snappy"]["wall_min_sec"], 3
        )
    for codec, r in results.items():
        out[codec] = {
            "wall_min_sec": min(r["wall"]),
            "wall_all": r["wall"],
            "bytes": r["bytes"][0],
            "files": r["files"][0],
        }
    out["zstd_bytes_over_snappy"] = round(
        out["zstd"]["bytes"] / out["snappy"]["bytes"], 4
    )
    out["zstd_wall_over_snappy_min"] = round(
        out["zstd"]["wall_min_sec"] / out["snappy"]["wall_min_sec"], 3
    )
    dst = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_zstd_r13.json"
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
