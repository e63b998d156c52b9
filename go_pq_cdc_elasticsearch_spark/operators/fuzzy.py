"""Fuzzy (edit-distance) string join via q-gram blocking.

Entity-resolution workhorse: find pairs of strings within Levenshtein
distance ``max_dist`` without the quadratic cross product. An edit
operation destroys at most ``q`` character q-grams, so two strings within
distance ``d`` share at least ``min_grams - d*q`` q-grams — whenever the
shorter string has more than ``d*q`` grams (i.e. ``len >= q*(d+1) + q - 1``
is comfortably sufficient), at least ONE shared gram survives and the
gram-block join is a complete candidate generator. The expensive
``levenshtein`` then runs on candidates only.

Scale shape: explode distinct q-grams per string (positions irrelevant for
blocking), ONE shuffle on the gram value, distinct pair set, then the
verify filter — the same block-then-verify skeleton as the MinHash/LSH
dedup path (operators/dedup.py). Ultra-frequent grams create hot buckets;
at corpus scale drop the top-f most frequent grams on BOTH sides (standard
stop-gram filtering — costs recall only for pairs whose every shared gram
is a stop-gram) or lean on AQE skew splitting, which applies because this
is a plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.functions.text import ascii_projected


def char_qgrams(col, q: int = 2) -> Column:
    """Array of DISTINCT character q-grams of a string column (blocking
    signature — positions and multiplicity don't matter for candidates)."""
    c = F.col(col) if isinstance(col, str) else col
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - (q - 1)),
        lambda i: c.substr(i, F.lit(q)),
    )
    return F.array_distinct(
        F.when(F.length(c) >= q, grams).otherwise(F.array().cast("array<string>"))
    )


def fuzzy_self_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs (id1 < id2) whose strings are within ``max_dist`` edits.

    Returns ``(id1, id2, s1, s2, dist)``. Complete whenever every string
    has more than ``max_dist * q`` q-grams (see module docstring);
    shorter outliers can be routed to a broadcast fallback by the caller.
    """
    # grams AND the verify distance run on the ASCII projection (see
    # functions/text.py::ascii_projected): byte-based vs codepoint-based
    # levenshtein diverges between engines on any non-ASCII char, and
    # blocking must use the SAME form as the verify or projected-equal
    # pairs with disjoint raw grams escape the candidate set (review r7).
    # Output s1/s2 stay the RAW strings.
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__s"),
        ascii_projected(F.col(text_col)).alias("__p"),
    )
    # IDs ONLY through the gram join (review r6): carrying the string
    # payload onto every exploded gram row shipped ~len(s) × n_grams(s)
    # bytes per string through the shuffle and the candidate distinct —
    # quadratic in string length. The candidate pair set is (id1, id2);
    # strings join back ONCE per candidate for the verify (the
    # dedup_corpus grams_df pattern).
    grams = base.select("__id", F.explode(char_qgrams(F.col("__p"), q)).alias("__g"))
    a = grams.select(F.col("__id").alias("id1"), "__g")
    b = grams.select(F.col("__id").alias("id2"), "__g")
    cand = (
        a.join(b, "__g")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    s1 = base.select(
        F.col("__id").alias("id1"), F.col("__s").alias("s1"),
        F.col("__p").alias("__p1"),
    )
    s2 = base.select(
        F.col("__id").alias("id2"), F.col("__s").alias("s2"),
        F.col("__p").alias("__p2"),
    )
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("dist", F.levenshtein(F.col("__p1"), F.col("__p2")).cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("id1", "id2", "s1", "s2", "dist")
    )
