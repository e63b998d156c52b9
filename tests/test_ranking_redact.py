"""PII redaction and BM25 ranking."""

from __future__ import annotations

import math

from pyspark.sql import Row

from go_pq_cdc_elasticsearch_spark.operators.ranking import bm25_topk, term_stats
from go_pq_cdc_elasticsearch_spark.operators.redact import redact


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


# ---- redact ----------------------------------------------------------------


def test_redact_each_kind(spark):
    df = _docs(
        spark,
        [
            "mail me at jo.doe+x@corp.example.org thanks",
            "server at 10.42.0.255 is down",
            "call +1 (555) 010-4477 now",
            "card 4111111111111111 leaked",
            "clean text with no pii at all",
        ],
    )
    out = {r["doc_id"]: r for r in redact(df).collect()}
    assert out[0]["n_email"] == 1 and "<EMAIL>" in out[0]["clean_text"]
    assert "jo.doe" not in out[0]["clean_text"]
    assert out[1]["n_ipv4"] == 1 and "<IP>" in out[1]["clean_text"]
    assert out[2]["n_phone"] == 1 and "<PHONE>" in out[2]["clean_text"]
    assert out[3]["n_digits"] == 1 and "<NUM>" in out[3]["clean_text"]
    r4 = out[4]
    assert (r4["n_email"], r4["n_ipv4"], r4["n_phone"], r4["n_digits"]) == (0, 0, 0, 0)
    assert r4["clean_text"] == "clean text with no pii at all"


def test_redact_counts_are_on_original_text(spark):
    # counts are measured independently on the original text: a text whose
    # digit run ALSO carries a phone-shaped grouping counts both kinds,
    # while clean_text consumes in declaration order (digits first)
    df = _docs(spark, ["num 123456789012 end, fax 555-867-5309"])
    r = redact(df).collect()[0]
    assert r["n_digits"] == 1
    assert r["n_phone"] == 1  # the 3-3-4 grouped number, NOT the bare run
    assert "<NUM>" in r["clean_text"] and "<PHONE>" in r["clean_text"]


# ---- BM25 ------------------------------------------------------------------


def test_term_stats(spark):
    df = _docs(spark, ["a b a", "b c"])
    tf, dl = term_stats(df)
    tf_map = {(r["doc_id"], r["term"]): r["tf"] for r in tf.collect()}
    assert tf_map == {(0, "a"): 2, (0, "b"): 1, (1, "b"): 1, (1, "c"): 1}
    dl_map = {r["doc_id"]: r["dl"] for r in dl.collect()}
    assert dl_map == {0: 3, 1: 2}


def test_bm25_hand_computed(spark):
    # corpus: d0="x x y", d1="y z", d2="z z z"; query = [x]
    # N=3, avgdl=8/3; x: df=1, tf(d0)=2, dl(d0)=3
    df = _docs(spark, ["x x y", "y z", "z z z"])
    got = bm25_topk(df, ["x"], k=5).collect()
    assert [r["doc_id"] for r in got] == [0]
    k1, b = 1.2, 0.75
    idf = math.log(1 + (3 - 1 + 0.5) / (1 + 0.5))
    tfp = 2 * (k1 + 1.0) / (2 + k1 * (1 - b + b * 3 / (8 / 3)))
    assert abs(got[0]["score"] - round(idf * tfp, 6)) < 1e-9


def test_bm25_rare_term_outranks_common(spark):
    # "rare" appears once in d0 only; "common" appears everywhere.
    df = _docs(
        spark,
        ["rare common pad pad", "common pad pad pad", "common pad pad pad"],
    )
    got = bm25_topk(df, ["rare", "common"], k=3).collect()
    assert got[0]["doc_id"] == 0  # the rare-term doc wins
    assert got[0]["score"] > got[1]["score"]


def test_bm25_deterministic_tie_break(spark):
    df = _docs(spark, ["t pad", "t pad", "t pad"])
    got = bm25_topk(df, ["t"], k=2).collect()
    assert [r["doc_id"] for r in got] == [0, 1]  # equal scores -> id order


def test_phone_pattern_precision(spark):
    """Phone-shape precision ladder (each line is a past prose-corruption
    class): the r4 form bounded LENGTH not digit count ('pages 3 ------
    12' matched); the r6 form required 7+ digits but allowed ZERO
    separators, so plain 7-8 digit integers and ISO dates were redacted
    as <PHONE> (review r7). Now a phone needs '+' or real 3-3-4 separator
    grouping; ungrouped domestic numbers are the stated recall cost."""
    from go_pq_cdc_elasticsearch_spark.operators.redact import redact_text

    untouched = [
        "see pages 3 ------ 12 for details",
        "Chapter 1\n\n    2022 edition",
        "released 2024-08-15, also written 15-08-2024",
        "population 1234567 grew by 234 567 people",
        "order 12345678 shipped",
    ]
    phones = [
        "call +44 207 946 0123 now",
        "call (555) 867-5309 now",
        "fax 555-867-5309 today",
        "intl +1 (555) 010-4477 desk",
    ]
    df = spark.createDataFrame([(t,) for t in untouched + phones], "t string")
    got = [r["r"] for r in df.select(redact_text("t").alias("r")).collect()]
    for raw, out in zip(untouched, got[: len(untouched)]):
        assert out == raw, f"prose corrupted: {raw!r} -> {out!r}"
    for raw, out in zip(phones, got[len(untouched):]):
        assert "<PHONE>" in out, f"phone missed: {raw!r} -> {out!r}"


def test_bm25_query_terms_normalized_like_index(spark):
    """Review r7: the corpus side lowercases via words(); a capitalized
    query term must hit the same postings, not silently score zero."""
    df = _docs(spark, ["paris is big", "london is bigger", "paris paris"])
    upper = {r["doc_id"]: r["score"] for r in bm25_topk(df, ["Paris"], k=3).collect()}
    lower = {r["doc_id"]: r["score"] for r in bm25_topk(df, ["paris"], k=3).collect()}
    assert upper and upper == lower
