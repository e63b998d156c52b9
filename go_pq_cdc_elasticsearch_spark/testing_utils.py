"""Shared oracle-comparison helpers (used by tests and tools/check.py).

Mirrors the driver's check: row count + column names + order-insensitive
value hash with doubles rounded to 6 decimals.
"""

from __future__ import annotations

import math

import duckdb

from go_pq_cdc_elasticsearch_spark.catalog import TABLES, table_path


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_rows(cols, rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "\x01".join(canon_value(r[i]) for i in order) for r in rows
    )


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def compare(spark_df, con, oracle: str) -> list[str]:
    """Return a list of problems (empty == match)."""
    scols = list(spark_df.columns)
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if not problems:
        sc = canon_rows(scols, srows)
        oc = canon_rows(ocols, orows)
        if sc != oc:
            diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            problems.append(f"values differ: {diffs}")
    return problems
