"""Skew handling: salted join.

At 100 TB a handful of hot keys (a viral user_id, a default tenant) can pin
an entire shuffle partition to one task. AQE's skew-join split handles most
cases (enabled in session.py); this operator is the explicit form for when
the skewed side is known — e.g. a replicated dimension too big to broadcast:

    left (skewed fact)  -> salt = deterministic hash(row) % n  (splits a hot
                           key's rows across n sub-partitions)
    right (smaller side) -> replicated n times, one copy per salt value
    join on (key, salt) -> co-located without any single hot partition

Replication multiplies the right side by n — choose n ~ (hot key rows /
average partition rows), keep the right side the smaller one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted and the right side
    replicated n_salts times. Result columns = left columns + right's
    non-key columns (same as df.join(right, on))."""
    on = list(on)
    # deterministic salt from the whole left row (no RNG: reruns and
    # retried tasks must salt identically)
    salt = F.pmod(
        F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts)
    ).alias("__salt")
    l_salted = left.select("*", salt)
    r_replicated = right.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("__salt")
    )
    out = l_salted.join(r_replicated, [*on, "__salt"], how)
    return out.drop("__salt")
