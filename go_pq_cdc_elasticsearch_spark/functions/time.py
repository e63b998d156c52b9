"""Timezone-proof time helpers.

The testdata's ``events.ts`` is TIMESTAMP_NTZ (wall time). Spark's
epoch-based bucketing idioms (``unix_timestamp`` round-trips, even
``date_trunc``) silently convert NTZ through the SESSION timezone — the
result then depends on the host session's zone and shifts across DST
transitions (measured oracle mismatches under America/New_York; UTC
sessions are correct only by coincidence). Field extraction + NTZ
reassembly never leaves wall time, so these helpers are bit-identical
under any session timezone — matching DuckDB's naive-timestamp semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def time_bucket_ntz(col, minutes: int) -> Column:
    """Wall-time bucket of a TIMESTAMP_NTZ column (TimescaleDB
    ``time_bucket`` semantics for sub-hour widths: ``minutes`` must divide
    60 so buckets align within the hour)."""
    if 60 % minutes != 0:
        raise ValueError("minutes must divide 60 for within-hour alignment")
    c = F.col(col) if isinstance(col, str) else col
    return F.make_timestamp_ntz(
        F.year(c),
        F.month(c),
        F.dayofmonth(c),
        F.hour(c),
        (F.floor(F.minute(c) / minutes) * minutes).cast("int"),
        F.lit(0.0),
    )
