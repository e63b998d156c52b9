"""Paragraph dedup, benchmark decontamination, unigram-LM surprisal."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.operators.contamination import (
    decontaminate,
    doc_gram_hashes,
)
from go_pq_cdc_elasticsearch_spark.operators.dedup import paragraph_dedup
from go_pq_cdc_elasticsearch_spark.operators.lm import doc_surprisal_millibits


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


# ---- paragraph_dedup -------------------------------------------------------


def test_paragraph_dedup_keeps_global_first_occurrence(spark):
    df = _docs(
        spark,
        [
            "alpha beta\ncommon line\ngamma",   # doc 0: all lines first seen
            "common line\ndelta",               # doc 1: line 1 is a repeat
            "  COMMON LINE ",                    # doc 2: repeat after lower+trim
        ],
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[0]["n_lines"] == 3 and out[0]["n_kept"] == 3
    assert out[0]["text"] == "alpha beta\ncommon line\ngamma"
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["text"] == "delta"
    # doc 2's only line normalizes to an earlier line -> nothing survives
    assert out[2]["n_lines"] == 1 and out[2]["n_kept"] == 0
    assert out[2]["text"] is None


def test_paragraph_dedup_blank_lines_dropped(spark):
    df = _docs(spark, ["a\n\n  \nb", "\n \n"])
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[0]["n_lines"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["text"] == "a\nb"
    # doc 1 is all-blank: no non-blank lines at all -> no output row
    assert 1 not in out


def test_paragraph_dedup_first_occurrence_is_doc_then_position(spark):
    # same line twice within one doc: first position wins
    df = _docs(spark, ["dup\nx\ndup"])
    r = paragraph_dedup(df).collect()[0]
    assert r["n_lines"] == 3 and r["n_kept"] == 2
    assert r["text"] == "dup\nx"


# ---- decontaminate ---------------------------------------------------------


def test_doc_gram_hashes_distinct_per_doc(spark):
    df = _docs(spark, ["a b a b a b"])  # 2-grams: "a b","b a" repeated
    got = doc_gram_hashes(df, n=2).collect()
    assert len(got) == 2  # distinct grams only


def test_decontaminate_flags_overlap(spark):
    train = _docs(
        spark,
        [
            "one two three four five six",      # shares 5-gram run with holdout
            "totally different words here now", # clean
        ],
    )
    holdout = spark.createDataFrame(
        [Row(doc_id=100, text="zz one two three four five yy")]
    )
    out = {r["doc_id"]: r["n_hit_grams"] for r in
           decontaminate(train, holdout, n=5).collect()}
    # train doc 0 grams: "one two three four five", "two three four five six";
    # holdout contains the first only.
    assert out == {0: 1}


def test_decontaminate_no_overlap_empty(spark):
    train = _docs(spark, ["a b c d e f g"])
    holdout = spark.createDataFrame([Row(doc_id=9, text="p q r s t u v")])
    assert decontaminate(train, holdout, n=5).count() == 0


# ---- doc_surprisal_millibits ----------------------------------------------


def test_surprisal_hand_computed(spark):
    # corpus: doc0 = "a a b", doc1 = "a c" -> counts a:3, b:1, c:1, N=5
    df = _docs(spark, ["a a b", "a c"])
    out = {r["doc_id"]: r for r in doc_surprisal_millibits(df).collect()}
    mb = lambda c: round(1000 * math.log2(5 / c))
    assert out[0]["n_tok"] == 3
    assert out[0]["surprisal_mb"] == 2 * mb(3) + mb(1)
    assert out[1]["n_tok"] == 2
    assert out[1]["surprisal_mb"] == mb(3) + mb(1)


def test_surprisal_rare_tokens_score_higher(spark):
    common = " ".join(["the"] * 20)
    rare = "zqx wvu klm nop qrs tuv wxy abc def ghi jkl mno pqr stu vwx yzz aaa bbb ccc ddd"
    df = _docs(spark, [common] * 5 + [rare])
    out = {r["doc_id"]: r["surprisal_mb"] for r in
           doc_surprisal_millibits(df).collect()}
    assert out[5] > out[0]  # gibberish doc carries more corpus-model bits


# ---- chunk_documents -------------------------------------------------------


def test_chunking_hand_computed(spark):
    from go_pq_cdc_elasticsearch_spark.operators.lm import chunk_documents

    # 10 tokens, chunk 4, overlap 2 -> stride 2 -> chunks at 0,2,4,6
    # formula: ceil((10-4)/2)+1 = 4 chunks; last is full (tokens 7..10)
    df = _docs(spark, ["t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"])
    out = sorted(
        (r["chunk_idx"], r["n_tok_chunk"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    )
    assert out == [
        (0, 4, "t1 t2 t3 t4"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t5 t6 t7 t8"),
        (3, 4, "t7 t8 t9 t10"),
    ]


def test_chunking_short_doc_single_chunk(spark):
    from go_pq_cdc_elasticsearch_spark.operators.lm import chunk_documents

    df = _docs(spark, ["a b c"])
    out = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    assert len(out) == 1
    assert out[0]["chunk_idx"] == 0
    assert out[0]["n_tok_chunk"] == 3
    assert out[0]["chunk_text"] == "a b c"


def test_chunking_tail_shorter(spark):
    from go_pq_cdc_elasticsearch_spark.operators.lm import chunk_documents

    # 7 tokens, chunk 4, overlap 2 -> ceil((7-4)/2)+1 = 3 chunks,
    # starts 0,2,4 -> [1..4],[3..6],[5..7] (tail has 3 tokens)
    df = _docs(spark, ["a b c d e f g"])
    out = sorted(
        (r["chunk_idx"], r["n_tok_chunk"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    )
    assert out == [
        (0, 4, "a b c d"),
        (1, 4, "c d e f"),
        (2, 3, "e f g"),
    ]


def test_paragraph_dedup_literal_separator(spark):
    # sep is a LITERAL: '|' must not be read as a regex alternation
    # (which would split on every character)
    df = _docs(spark, ["aa|bb", "bb|cc"])
    out = {r["doc_id"]: r for r in paragraph_dedup(df, sep="|").collect()}
    assert out[0]["n_lines"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["text"] == "aa|bb"
    assert out[1]["n_kept"] == 1 and out[1]["text"] == "cc"


# ---- decontaminate_bloom ----------------------------------------------------


def test_bloom_decontaminate_matches_exact(spark):
    """The sketch path's contract is row-identity with the exact join —
    false negatives are impossible (Bloom property) and the verification
    join removes every false positive. Checked at the default sizing AND
    at a pathological 1-bit/1-hash bitmap where nearly every gram is a
    false-positive candidate."""
    from go_pq_cdc_elasticsearch_spark.operators.contamination import (
        decontaminate_bloom,
    )

    train = _docs(
        spark,
        [
            "one two three four five six",
            "totally different words here now",
            "zz one two three four five yy tail words",
        ],
    )
    holdout = spark.createDataFrame(
        [Row(doc_id=100, text="zz one two three four five yy")]
    )
    exact = {(r["doc_id"], r["n_hit_grams"]) for r in
             decontaminate(train, holdout, n=5).collect()}
    assert exact  # non-degenerate fixture
    for kwargs in ({}, {"bits_per_gram": 1, "n_hashes": 1}):
        got = {(r["doc_id"], r["n_hit_grams"]) for r in
               decontaminate_bloom(train, holdout, n=5, **kwargs).collect()}
        assert got == exact, kwargs


def test_bloom_decontaminate_empty_and_clean_holdout(spark):
    from go_pq_cdc_elasticsearch_spark.operators.contamination import (
        decontaminate_bloom,
    )

    train = _docs(spark, ["a b c d e f g"])
    clean = spark.createDataFrame([Row(doc_id=9, text="p q r s t u v")])
    assert decontaminate_bloom(train, clean, n=5).count() == 0
    # holdout with no gram at all (too short for n=5)
    short = spark.createDataFrame([Row(doc_id=9, text="p q")])
    assert decontaminate_bloom(train, short, n=5).count() == 0


def test_bloom_prefilter_is_map_only_jvm(spark):
    """Plan pin for the 100 TB claim: the training-corpus prefilter has
    NO exchange (map-only — only verified candidates ever shuffle) and
    no Python evaluation (the bitmap membership test is column algebra
    over a binary literal inside codegen)."""
    from go_pq_cdc_elasticsearch_spark.operators.contamination import (
        _bloom_might_contain,
        _gram_hash_rows,
        build_gram_bloom_from_hashes,
    )
    from pyspark.sql import functions as F

    train = _docs(spark, ["one two three four five six seven eight nine"])
    holdout = spark.createDataFrame(
        [Row(doc_id=100, text="one two three four five six")]
    )
    hashes = [
        r["gh"] for r in _gram_hash_rows(holdout, "text", 5).distinct().collect()
    ]
    bitmap, m_bits = build_gram_bloom_from_hashes(hashes)
    pre = doc_gram_hashes(train, "text", "doc_id", 5).filter(
        _bloom_might_contain(F.col("gh"), bitmap, m_bits, 5)
    )
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_bloom_positions_python_jvm_agree(spark):
    """The drift-critical invariant of the Bloom path: the driver-side
    bit positions (build) and the JVM conv(substring(...)) positions
    (probe) must agree for EVERY digest, or a holdout gram could land in
    bits the probe never tests — a silent false negative, the one
    failure class verification cannot repair. Fuzzed over random
    digests and bitmap sizes."""
    import hashlib
    import random

    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.operators.contamination import (
        _BLOOM_WINDOW_OFFSETS,
        _bloom_positions_py,
    )

    rng = random.Random(11)
    digests = [
        hashlib.md5(str(rng.random()).encode()).hexdigest() for _ in range(200)
    ]
    for m_bits in (64, 1000, 12_345_678):
        n_hashes = len(_BLOOM_WINDOW_OFFSETS)
        df = spark.createDataFrame([(d,) for d in digests], "gh string")
        cols = [
            F.pmod(
                F.conv(F.substring("gh", off + 1, 15), 16, 10).cast("bigint"),
                F.lit(m_bits),
            ).alias(f"p{i}")
            for i, off in enumerate(_BLOOM_WINDOW_OFFSETS)
        ]
        jvm = {
            r["gh"]: [r[f"p{i}"] for i in range(n_hashes)]
            for r in df.select("gh", *cols).collect()
        }
        for d in digests:
            assert _bloom_positions_py(d, m_bits, n_hashes) == jvm[d], (
                d,
                m_bits,
            )


def test_bloom_n_hashes_validated_on_both_sides(spark):
    """Build AND probe reject an out-of-range n_hashes (review r11): the
    probe silently truncating to the available windows would test bits a
    differently-sized build never set — silent false negatives."""
    import pytest

    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.operators.contamination import (
        _bloom_might_contain,
        build_gram_bloom_from_hashes,
    )

    with pytest.raises(ValueError, match="n_hashes"):
        build_gram_bloom_from_hashes(["ab" * 16], n_hashes=7)
    with pytest.raises(ValueError, match="n_hashes"):
        _bloom_might_contain(F.col("gh"), b"\x00" * 8, 64, 7)
    with pytest.raises(ValueError, match="n_hashes"):
        _bloom_might_contain(F.col("gh"), b"\x00" * 8, 64, 0)
