"""Heavy hitters (frequent items) at corpus scale.

The reference has no analytics operators (SURVEY.md §2.1 is a linear CDC
pipe) — this belongs to the LLM-pipeline extension mandated by the north
star: token/phrase frequency analysis is the boilerplate-detection
housekeeping step of corpus curation (C4/RefinedWeb-style), and "which
keys dominate the stream" is the skew question every CDC operator at
scale eventually asks.

Scale shape: a naive ``groupBy(token).count()`` over 100 TB of exploded
tokens shuffles the FULL vocabulary cardinality to find the handful of
items above a support threshold. ``heavy_hitters`` instead does:

1. **candidate pass** — Spark's built-in ``DataFrame.freqItems`` sketch
   (one JVM pass: Karp/Shenker/Papadimitriou lossy counters per
   partition, merged), whose output is guaranteed to be a SUPERSET of
   every item with frequency >= support (false positives possible, false
   negatives not);
2. **exact verify pass** — broadcast the small candidate set, count ONLY
   the rows matching a candidate (broadcast hash semi-join — the shuffle
   carries at most ~1/support keys instead of the vocabulary), and filter
   by the exact threshold.

The final counts are EXACT — the sketch only prunes — which is what lets
the q_l26 DuckDB oracle check full value parity against a from-scratch
``GROUP BY``. Threshold arithmetic is pure integers
(``cnt * den >= num * total``), portable by construction: no float
support fraction ever touches the comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    col: str,
    support_num: int = 1,
    support_den: int = 100,
) -> DataFrame:
    """Exact frequency counts of every non-null item in ``df[col]`` whose
    count ``cnt`` satisfies ``cnt * support_den >= support_num * total``
    (i.e. frequency >= support_num/support_den of non-null rows).

    Returns (col, cnt) — exact, deterministic. The candidate set is
    collected to the driver (contractual small set: bounded by ~2/support,
    independent of data volume).

    Cost shape: three scans of the input (total count, sketch pass,
    verify pass) — deliberate. At corpus scale the exploded token stream
    is far larger than executor storage, so caching it would thrash;
    three streaming scans of a columnar source beat one cached pass that
    spills. Callers that DO hold a small input can persist it before
    calling.
    """
    if support_num <= 0 or support_den <= 0:
        raise ValueError("support_num/support_den must be positive")
    support = support_num / support_den
    if support < 2e-4:
        # the sketch runs at support/2 (see below) and freqItems' documented
        # lower bound is 1e-4; below this the candidate set stops being
        # usefully small anyway
        raise ValueError("support below 2e-4 — use a plain groupBy")

    non_null = df.select(col).where(F.col(col).isNotNull())
    total = non_null.count()
    if total == 0:
        return non_null.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))

    # the Karp/Shenker/Papadimitriou guarantee is STRICT: items with
    # count > support*n are present, count == support*n is not promised.
    # Sketch at support/2 so every item passing the >= threshold is a
    # guaranteed candidate (count >= n*num/den > n*num/(2*den) for n > 0);
    # the candidate bound stays ~2/support — still driver-trivial.
    cand_items = non_null.freqItems([col], support=support / 2).first()[0]
    spark = df.sparkSession
    cands = spark.createDataFrame(
        [(c,) for c in cand_items], schema=non_null.schema
    )
    return (
        non_null.join(F.broadcast(cands), on=col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * F.lit(support_den) >= F.lit(support_num * total))
    )
