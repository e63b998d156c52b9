"""Canonical checksum folding for extension queries.

The driver's CORRECTNESS artifact caps at 50 registry entries, so the 20+
relational extension queries (q_s23..q_s44) are folded into two combo
entries (``q_sx1_*``, ``q_sx2_*``). Each sub-query's full result is reduced
to one row ``(part, n_rows, checksum)`` where ``checksum`` is an
order-independent sum of per-row hashes over a *type-canonical* string form
— identical in Spark and DuckDB, so value parity is still checked cell by
cell, just pre-aggregated.

Canonical cell form (both engines, per column type):
- integer-ish  -> plain decimal string (``42``)
- float/double -> ``floor(x * 10^4 + 0.5)`` as a BIGINT string (``15625``
  for 1.5625) — an explicit half-up in pure IEEE-754 double ops, so both
  engines compute the identical integer from the identical double.
  In-engine ``round(x, 4)`` is NOT portable: for a non-representable tie
  like 0.00565 (double 0.0056499999…), DuckDB rounds the true binary
  value down while Spark re-parses the shortest decimal repr "0.00565"
  and rounds it HALF_UP — found live at sf0.1 in q_l5's checksum.
  NaN/±Inf map to literal sentinels before the arithmetic.
- decimal      -> plain string (scale preserved on both sides)
- string       -> as-is
- date/ts      -> formatted ``yyyy-MM-dd [HH:mm:ss]``
- NULL         -> ``ø``

Row hash: first 8 md5 hex digits of the ``|``-joined cells (columns sorted
by name) as a bigint — ``conv(substr(md5(s),1,8),16,10)`` in Spark equals
``CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)`` in DuckDB (verified
round 1 by the q_l4 value-parity oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_SENTINEL = "ø"


def _spark_cell(field: T.StructField):
    c = F.col(field.name)
    t = field.dataType
    if isinstance(t, (T.FloatType, T.DoubleType)):
        d = c.cast("double")
        scaled = F.floor(d * F.lit(10_000.0) + F.lit(0.5)).cast("long")
        # |x| >= 9e14 would overflow the x*1e4 BIGINT (DuckDB errors, Spark
        # saturates) — above that, 4dp is noise anyway, so the canonical
        # form degrades to floor(x). Spark's floor(double) returns BIGINT
        # and SATURATES at ±2^63 (DuckDB computes the true integer), so the
        # long-intermediate floor is only used below 2^52 — where doubles
        # can still be fractional but always fit a long — and above 2^52
        # every double is integral, so a direct double->decimal(38,0) cast
        # IS the floor, exact in both engines (both error past 1e38).
        big = (
            F.when(F.abs(d) < F.lit(4.5e15), F.floor(d).cast("decimal(38,0)"))
            .otherwise(d.cast("decimal(38,0)"))
            .cast("string")
        )
        s = (
            F.when(F.isnan(d), F.lit("NaN"))
            .when(d == F.lit(float("inf")), F.lit("Inf"))
            .when(d == F.lit(float("-inf")), F.lit("-Inf"))
            .when(F.abs(d) >= F.lit(9.0e14), big)
            .otherwise(scaled.cast("string"))
        )
    elif isinstance(t, T.DecimalType) or isinstance(
        t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)
    ):
        s = c.cast("string")
    elif isinstance(t, T.DateType):
        s = F.date_format(c, "yyyy-MM-dd")
    elif isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        s = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    elif isinstance(t, T.StringType):
        s = c
    else:
        raise TypeError(f"no canonical form for column {field.name}: {t}")
    return F.coalesce(s, F.lit(NULL_SENTINEL))


def spark_canon_summary(df: DataFrame, part: str) -> DataFrame:
    """Reduce a result DataFrame to one (part, n_rows, checksum) row."""
    fields = sorted(df.schema.fields, key=lambda f: f.name)
    row_str = F.concat_ws("|", *[_spark_cell(f) for f in fields])
    h = F.conv(F.substring(F.md5(row_str), 1, 8), 16, 10).cast("long")
    return df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum("h"), F.lit(0)).cast("long").alias("checksum"),
    ).select(F.lit(part).alias("part"), "n_rows", "checksum")


def _duck_cell(name: str, duck_type: str) -> str:
    t = duck_type.upper()
    col = f'"{name}"'
    if t in ("DOUBLE", "FLOAT", "REAL"):
        d = f"CAST({col} AS DOUBLE)"
        s = (
            f"CASE WHEN isnan({d}) THEN 'NaN' "
            f"WHEN isinf({d}) AND {d} > 0 THEN 'Inf' "
            f"WHEN isinf({d}) THEN '-Inf' "
            # shortest-repr parity with Spark: Spark's double->decimal cast
            # parses the double's shortest decimal string, while DuckDB's
            # direct cast converts the exact binary value (1.7e25 ->
            # ...999177916416) — route through VARCHAR so both engines
            # canonicalize the same integer
            f"WHEN abs({d}) >= 9.0e14 "
            f"THEN CAST(CAST(CAST(floor({d}) AS VARCHAR) AS DECIMAL(38,0)) AS VARCHAR) "
            f"ELSE CAST(CAST(floor({d} * 10000.0 + 0.5) AS BIGINT) AS VARCHAR) END"
        )
    elif t.startswith("DECIMAL") or t in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "BOOLEAN",
    ):
        s = f"CAST({col} AS VARCHAR)"
    elif t == "DATE":
        s = f"strftime({col}, '%Y-%m-%d')"
    elif t.startswith("TIMESTAMP"):
        s = f"strftime({col}, '%Y-%m-%d %H:%M:%S')"
    elif t == "VARCHAR":
        s = col
    else:
        raise TypeError(f"no canonical form for column {name}: {duck_type}")
    return f"coalesce({s}, '{NULL_SENTINEL}')"


def duckdb_canon_sql(inner_sql: str, part: str, col_types: list[tuple[str, str]]) -> str:
    """Wrap an oracle SQL text into its (part, n_rows, checksum) summary.

    ``col_types`` comes from DuckDB DESCRIBE of the inner query (see
    tools/gen_ext_oracle.py, which writes sql/_ext_oracle_gen.py)."""
    cells = ", ".join(
        _duck_cell(n, t) for n, t in sorted(col_types, key=lambda x: x[0])
    )
    h = "CAST(concat('0x', substr(md5(concat_ws('|', " + cells + ")), 1, 8)) AS BIGINT)"
    return (
        f"SELECT '{part}' AS part, count(*) AS n_rows, "
        f"CAST(coalesce(sum(h), 0) AS BIGINT) AS checksum "
        f"FROM (SELECT {h} AS h FROM ({inner_sql}))"
    )
