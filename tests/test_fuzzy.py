"""Q-gram-blocked fuzzy (edit distance) join."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.operators.fuzzy import (
    char_qgrams,
    fuzzy_self_join,
)


def test_char_qgrams(spark):
    df = spark.createDataFrame([Row(s="abcd"), Row(s="a"), Row(s="aaa")])
    got = {r["s"]: r["g"] for r in df.select("s", char_qgrams("s").alias("g")).collect()}
    assert got["abcd"] == ["ab", "bc", "cd"]
    assert got["a"] == []          # shorter than q
    assert got["aaa"] == ["aa"]    # distinct grams only


def test_fuzzy_self_join_hand_case(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, s="red bolt"),
            Row(id=2, s="red bolts"),   # dist 1 to id 1
            Row(id=3, s="ted jolt"),    # dist 2 to id 1 (r->t, b->j)
            Row(id=4, s="blue widget"), # far from everything
        ]
    )
    out = {
        (r["id1"], r["id2"]): r["dist"]
        for r in fuzzy_self_join(df, "s", "id", max_dist=2).collect()
    }
    assert out[(1, 2)] == 1
    assert out[(1, 3)] == 2
    assert (1, 4) not in out and (2, 4) not in out and (3, 4) not in out


def test_fuzzy_join_matches_naive_quadratic(spark):
    # blocking completeness on strings long enough for the q-gram guarantee
    words = [
        "streaming", "streeming", "strawming", "scheduler", "schedulers",
        "partition", "partitions", "partifion", "broadcast", "broadcest",
    ]
    df = spark.createDataFrame([Row(id=i, s=s) for i, s in enumerate(words)])
    got = sorted(
        (r["id1"], r["id2"], r["dist"])
        for r in fuzzy_self_join(df, "s", "id", max_dist=2).collect()
    )
    a = df.select(F.col("id").alias("id1"), F.col("s").alias("s1"))
    b = df.select(F.col("id").alias("id2"), F.col("s").alias("s2"))
    naive = sorted(
        (r["id1"], r["id2"], r["dist"])
        for r in a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("dist", F.levenshtein("s1", "s2").cast("long"))
        .filter(F.col("dist") <= 2)
        .collect()
    )
    assert got == naive and len(got) >= 4
