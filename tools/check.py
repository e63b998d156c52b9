"""Local correctness gate: run every registered query on Spark (sf0.01 by
default) and its oracle on DuckDB, compare row count, column names and an
order-insensitive value hash (doubles rounded to 6 decimals) — mimicking the
driver's CORRECTNESS check.

Usage: python tools/check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from go_pq_cdc_elasticsearch_spark.session import get_spark  # noqa: E402
from go_pq_cdc_elasticsearch_spark.sql import EXT_REGISTRY, REGISTRY  # noqa: E402

# the ONE comparison implementation (canonicalization + view setup),
# shared with the tests — a second copy here had already started to
# drift from the one testing_utils.py documents as shared (review r5)
from go_pq_cdc_elasticsearch_spark.testing_utils import (  # noqa: E402
    compare_rows,
    duckdb_con,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    known = {**REGISTRY, **EXT_REGISTRY}
    unknown = only - set(known)
    if unknown:
        # a typo'd filter name used to run NOTHING and exit 0 ('0 pass,
        # 0 fail') — a scripted verify step then saw green while zero
        # oracle comparisons ran (review r5)
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2
    spark = get_spark("check")
    con = duckdb_con(sf_dir)
    n_pass = n_fail = n_rows_only = 0
    for name, q in sorted(known.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.spark(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare_rows(scols, srows, ocols, orows)
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
