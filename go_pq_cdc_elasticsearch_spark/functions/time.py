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


def _ntz_whole_minute_seconds(c: Column) -> Column:
    """Epoch seconds of the wall time's whole-minute prefix, from field
    extraction only — shared by both epoch helpers so a future edge fix
    can't silently cover one and miss the other."""
    return (
        F.unix_date(c.cast("date")).cast("long") * 86400
        + F.hour(c).cast("long") * 3600
        + F.minute(c).cast("long") * 60
    )


def ntz_epoch_seconds(col) -> Column:
    """Epoch seconds of a TIMESTAMP_NTZ wall time *interpreted as UTC*,
    computed purely from field extraction — no session-timezone conversion
    anywhere, so the value is identical under any session zone and across
    DST transitions. Matches DuckDB's ``epoch(ts)`` on naive timestamps
    (which also treats the wall time as UTC). Second precision (fractional
    seconds truncated)."""
    c = F.col(col) if isinstance(col, str) else col
    return _ntz_whole_minute_seconds(c) + F.second(c).cast("long")


def ntz_epoch_micros(col) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ wall time interpreted as UTC —
    same contract as :func:`ntz_epoch_seconds` but exact to the
    microsecond (EXTRACT(SECOND) keeps the fraction). Unlike
    ``unix_micros(c.cast('timestamp'))``, never converts through the
    session zone, so gap arithmetic stays correct across DST transitions
    under any session zone."""
    c = F.col(col) if isinstance(col, str) else col
    return _ntz_whole_minute_seconds(c) * 1_000_000 + (
        F.extract(F.lit("SECOND"), c) * 1_000_000
    ).cast("long")


def time_bucket_ntz(col, minutes: int) -> Column:
    """Wall-time bucket of a TIMESTAMP_NTZ column (TimescaleDB
    ``time_bucket`` semantics for sub-hour widths: ``minutes`` must be a
    positive divisor of 60 so buckets align within the hour)."""
    if minutes <= 0 or 60 % minutes != 0:
        # <= 0 first: `60 % 0` raises ZeroDivisionError, and negative
        # divisors of 60 pass `60 % m != 0` in Python (60 % -5 == 0) yet
        # produce minute=60 for a row at :59 (invalid reassembly)
        raise ValueError(
            "minutes must be a positive divisor of 60 for within-hour "
            "alignment"
        )
    c = F.col(col) if isinstance(col, str) else col
    return F.make_timestamp_ntz(
        F.year(c),
        F.month(c),
        F.dayofmonth(c),
        F.hour(c),
        (F.floor(F.minute(c) / minutes) * minutes).cast("int"),
        F.lit(0.0),
    )
