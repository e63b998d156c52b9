"""Dump `explain("formatted")` for declared/EXT queries into plans/r13/.

Usage: python tools/dump_plan_r13.py <tag> <query_name> [...]
       python tools/dump_plan_r13.py --summary <tag> <part_name> [...]
Writes plans/r13/<query>_<tag>.txt (tag: before|after|audit).

--summary dumps the CANON SUMMARY plan over the named EXT part (the r13
canon rewrite changed how the summary expression reaches the JVM, not the
part plans themselves, so the evidence lives in the summary plan).
SPARK_GRAFT_CANON_MODULE can point at an alternate canon module file (e.g.
a git-show of the r12 version) to produce the before-plan from old code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_pq_cdc_elasticsearch_spark.session import get_spark  # noqa: E402
from go_pq_cdc_elasticsearch_spark.sql import EXT_REGISTRY, REGISTRY  # noqa: E402


def _summary_fn():
    alt = os.environ.get("SPARK_GRAFT_CANON_MODULE")
    if alt:
        import importlib.util

        spec = importlib.util.spec_from_file_location("canon_alt", alt)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.spark_canon_summary
    from go_pq_cdc_elasticsearch_spark.sql.canon import spark_canon_summary

    return spark_canon_summary


def main() -> int:
    args = sys.argv[1:]
    summary_mode = args and args[0] == "--summary"
    if summary_mode:
        args = args[1:]
    tag, names = args[0], args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plan_r13")
    spark.sparkContext.setLogLevel("ERROR")
    known = {**REGISTRY, **EXT_REGISTRY}
    unknown = [n for n in names if n not in known]
    if unknown:
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        return 2
    for name in names:
        df = known[name].spark(spark, sf_dir)
        stem = name
        if summary_mode:
            df = _summary_fn()(df, name)
            stem = f"canon_summary_{name}"
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{stem}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
