"""Engine-portable rounding.

``round(x, n)`` is NOT portable across engines for ties: DuckDB rounds the
true binary double (0.00565 is stored as 0.0056499999…, so it rounds DOWN)
while Spark re-parses the shortest decimal representation ("0.00565") into
a BigDecimal and rounds it HALF_UP — found live as a q_l5 checksum mismatch
at sf0.1. ``pround`` instead computes ``floor(x·10ⁿ + 0.5) / 10ⁿ``: every
step (multiply, add, floor, divide) is a single IEEE-754 double op, so two
engines given the identical input double produce the identical output
double — no decimal re-parse, no tie convention.

For noisy cross-engine inputs (float-sum order differences) no rounding
convention can disagree less than the inputs do; ``pround`` at a coarse
scale still absorbs noise exactly as well as native ``round`` (the output
differs only when the inputs straddle a 10⁻ⁿ boundary).

``PROUND_SQL`` is the DuckDB twin — oracle SQL must use it wherever the
Spark side uses ``pround`` so both engines run the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column | str, n: int) -> Column:
    """Portable round of a double to ``n`` decimal places.

    Tie direction: ``floor(x·10ⁿ + 0.5)`` rounds ties toward **+infinity**
    on both engines — for NEGATIVE ties that is toward zero, not away from
    it (pround(-0.0000005, 6) = 0.0, where Java HALF_UP gives -0.000001).
    Signed inputs (cosine sims) get a consistent, engine-identical
    convention either way; don't call it half-up for negatives.

    Domain preconditions: (a) |x·10ⁿ| must stay below 2⁶³ — Spark's
    floor(double) returns BIGINT and SATURATES at Long.MAX while DuckDB's
    floor returns the exact double, so beyond that bound the two engines
    diverge (the floor-saturation portability trap); (b) x must be FINITE
    — Spark's floor maps NaN→0 and ±Inf→±Long.MAX while DuckDB's floor
    keeps NaN/Inf, so a non-finite input breaks parity. Every caller here
    is a score/ratio/percentile (finite, |x| ≤ ~10⁶ at n ≤ 6); for
    unbounded magnitudes (money sums) use sql/canon.py's banded integer
    ladder, which handles NaN/Inf/huge bands explicitly."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(float(10**n))
    return (F.floor(c.cast("double") * p + F.lit(0.5)).cast("double") / p)


def pround_sql(expr: str, n: int) -> str:
    """DuckDB SQL computing the identical portable round of ``expr``."""
    p = float(10**n)
    return f"(floor(CAST({expr} AS DOUBLE) * {p} + 0.5) / {p})"
