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
    non-key columns (same as df.join(right, on)).

    Supported ``how``: inner / left / left_semi / left_anti — the joins
    where each LEFT row carries exactly one salt, so its match set against
    the replicated right is identical to the unsalted join. right/full
    outer are REJECTED: every right row is replicated n_salts times and
    only one replica can match a given left row, so the other n_salts-1
    replicas would emit spurious null-extended rows (verified: a 2-row
    full join came back as 8 rows). Salt the other side instead.
    """
    on = list(on)
    for side, cols in (("left", left.columns), ("right", right.columns)):
        if "__salt" in cols:
            # same reserved-name discipline as cdc_dedup/asof_join: the
            # select("*", salt) would DUPLICATE the name and the join on
            # [*on, '__salt'] then dies ambiguous (or worse, matches the
            # caller's column instead of the salt)
            raise ValueError(
                f"salted_join reserves the column name '__salt' "
                f"({side} side carries one)"
            )
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}"
            " — replicate-right salting breaks right/full outer semantics"
        )
    # deterministic salt from the whole left row (no RNG: reruns and
    # retried tasks must salt identically). MAP columns are unhashable
    # (Spark raises HASH_MAP_TYPE — the CDC envelope's payload maps hit
    # this); the salt only needs per-row dispersion, so hash the hashable
    # columns.
    # substring check, not startswith: HASH_MAP_TYPE rejects MapType
    # RECURSIVELY, so struct<...map<...>...> / array<map<...>> columns
    # (the other CDC envelope shapes) are just as unhashable
    if n_salts <= 0:
        # n_salts=0 emptied the replicated right side (an inner join
        # silently returned 0 rows) and pmod(hash, 0) is an ANSI
        # DIVIDE_BY_ZERO at runtime (review r7)
        raise ValueError(f"salted_join: n_salts must be positive, got {n_salts}")
    hashable = [c for c, t in left.dtypes if "map<" not in t]
    if not hashable:
        raise ValueError("salted_join needs at least one non-map left column")
    # monotonically_increasing_id mixed in: when a hot key's rows are
    # IDENTICAL across every hashable column (the CDC-envelope case — only
    # the unhashable payload map varies), the row hash alone is one
    # constant and the hot key still landed on a single salt, silently
    # defeating the operator while paying the full right-side replication
    # (review r7). The row id is not replay-deterministic, but the salt
    # only controls partition PLACEMENT — join results are identical for
    # any salt value, so determinism is not required here.
    salt = F.pmod(
        F.hash(*[F.col(c) for c in hashable])
        + F.monotonically_increasing_id(),
        F.lit(n_salts),
    ).alias("__salt")
    l_salted = left.select("*", salt)
    r_replicated = right.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("__salt")
    )
    out = l_salted.join(r_replicated, [*on, "__salt"], how)
    return out.drop("__salt")
