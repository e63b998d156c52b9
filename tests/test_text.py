"""Text functions vs a pure-Python model."""

import hashlib
import re

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.functions import text as TX

SAMPLES = [
    "The quick, brown fox! It jumps over 2 lazy dogs.",
    "  spaced   out    text  ",
    "nopunct plain words here",
    "a the of and to in is it",
]


def _py_norm(s):
    return re.sub(r"\s+", " ", s.strip().lower())


def test_token_counts(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i long, t string")
    out = {
        r["i"]: (r["ws"], r["bpe"])
        for r in df.select(
            "i",
            TX.token_count_ws(F.col("t")).alias("ws"),
            TX.token_count_bpe(F.col("t")).alias("bpe"),
        ).collect()
    }
    for i, s in enumerate(SAMPLES):
        assert out[i][0] == len(_py_norm(s).split(" "))
        assert out[i][1] == len(re.findall(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]", s))


def test_fingerprint_whitespace_case_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, " hello world "), (3, "other")], "i long, t string"
    )
    fps = {r["i"]: r["fp"] for r in df.select("i", TX.fingerprint(F.col("t")).alias("fp")).collect()}
    assert fps[1] == fps[2] != fps[3]
    assert fps[1] == hashlib.md5(b"hello world").hexdigest()[:16]


def test_quality_score_bounds_and_ordering(spark):
    good = "the cat sat on the mat and it is a good day in the park " * 10
    bad = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    df = spark.createDataFrame([(1, good), (2, bad)], "i long, t string")
    q = {r["i"]: r["q"] for r in df.select("i", TX.quality_score(F.col("t")).alias("q")).collect()}
    assert 0.0 <= q[2] < q[1] <= 1.0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is here"),
            (2, "der hund und die katze ist hier und der mann"),
            (3, "le chien et la maison est grande et le chat"),
            (4, "el perro y los gatos es grande y el sol"),
        ],
        "i long, t string",
    )
    out = {r["i"]: r["l"] for r in df.select("i", TX.lang_id(F.col("t")).alias("l")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es"}


def test_lang_id_markerless_is_und(spark):
    """Zero marker hits in every language must stay 'und': seeded at -1,
    the first language's 0-hit score used to win and markerless (or
    blank) documents were reported as 'en'."""
    df = spark.createDataFrame(
        [(1, "xyzzy plugh quux"), (2, ""), (3, "   "), (4, "the cat")],
        "i long, t string",
    )
    out = {
        r["i"]: r["l"]
        for r in df.select("i", TX.lang_id(F.col("t")).alias("l")).collect()
    }
    assert out == {1: "und", 2: "und", 3: "und", 4: "en"}


def test_normalize_text_edge_whitespace(spark):
    """trim() strips only ' ' in both engines, so trimming BEFORE the
    collapse left edge tabs/newlines alive as a leading/trailing space —
    a different dedup fingerprint than the clean form and a phantom empty
    edge token in words() (review r5)."""
    df = spark.createDataFrame(
        [("hello world\n",), ("\thello   world",), ("hello world",)],
        "text string",
    )
    out = [r[0] for r in df.select(TX.normalize_text(F.col("text"))).collect()]
    assert out == ["hello world"] * 3
    toks = [r[0] for r in df.select(TX.token_count_ws(F.col("text"))).collect()]
    assert toks == [2, 2, 2]


def test_time_bucket_rejects_bad_minutes(spark):
    import pytest

    from go_pq_cdc_elasticsearch_spark.functions.time import time_bucket_ntz

    with pytest.raises(ValueError, match="positive divisor"):
        time_bucket_ntz("ts", 0)
    with pytest.raises(ValueError, match="positive divisor"):
        time_bucket_ntz("ts", -5)
    with pytest.raises(ValueError, match="positive divisor"):
        time_bucket_ntz("ts", 7)


def test_whitespace_class_is_engine_portable(spark):
    """Review r8 (live-probed): Java's \\s includes U+000B (vertical tab),
    DuckDB/RE2's does not — a \\s in the dedup normal form silently
    diverged fingerprints/token counts/n-grams/punct ratios between
    engine and oracle on any text containing one. Both sides now spell
    the class out (PORTABLE_WS); this pins Spark-vs-DuckDB equality on a
    vertical-tab-bearing text for every derived signal."""
    import duckdb

    from go_pq_cdc_elasticsearch_spark.sql.llm_queries import NORM_SQL

    s = "a\x0bb\tc  d\x0c"
    row = (
        spark.createDataFrame([(s,)], "text string")
        .select(
            TX.normalize_text(F.col("text")).alias("norm"),
            TX.token_count_ws(F.col("text")).alias("ws"),
            TX.token_count_bpe(F.col("text")).alias("bpe"),
            TX.punct_ratio(F.col("text")).alias("punct"),
            TX.fingerprint(F.col("text")).alias("fp"),
        )
        .first()
    )
    con = duckdb.connect()
    import pandas as pd

    con.register("documents", pd.DataFrame({"text": [s]}))
    dn, dws, dbpe, dpunct, dfp = con.execute(
        f"""SELECT {NORM_SQL},
                   CAST(len(string_split({NORM_SQL}, ' ')) AS BIGINT),
                   CAST(len(regexp_extract_all(text, '{TX.BPE_TOKEN_RE}')) AS BIGINT),
                   CAST(length(text) - length(regexp_replace(text,
                        '[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
                        / length(text),
                   substr(md5({NORM_SQL}), 1, 16)
            FROM documents"""
    ).fetchone()
    assert row["norm"] == dn == "a b c d"
    assert row["ws"] == dws == 4
    assert row["bpe"] == dbpe == 4
    assert abs(row["punct"] - dpunct) < 1e-12
    assert row["fp"] == dfp
