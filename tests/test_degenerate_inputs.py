"""Degenerate-input hardening: empty frames, empty strings, zero vectors,
zero-token strata — crash-class bugs under Spark 4's default ANSI mode
(division by a data-derived zero is a hard SparkArithmeticException)."""

import numpy as np
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.operators import dedup as DD
from go_pq_cdc_elasticsearch_spark.operators import similarity as SIM


def test_cosine_zero_norm_is_null_not_crash(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = df.select(DD.cosine(F.col("a"), F.col("b")).alias("s")).collect()
    assert got[0]["s"] is None  # zero-norm -> NULL (DuckDB x/0.0 parity)
    assert abs(got[1]["s"] - 1.0) < 1e-12


def test_punct_ratio_empty_string_is_null(spark):
    from go_pq_cdc_elasticsearch_spark.functions.text import punct_ratio

    df = spark.createDataFrame([("",), ("a.b",)], "t string")
    got = [r["p"] for r in df.select(punct_ratio(F.col("t")).alias("p")).collect()]
    assert got[0] is None
    assert abs(got[1] - 1.0 / 3) < 1e-12


def test_quality_gate_survives_empty_text(spark):
    from go_pq_cdc_elasticsearch_spark.operators.repetition import quality_gate

    df = spark.createDataFrame(
        [(1, ""), (2, "the quick brown fox is a fine animal of the north")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_gate(df).collect()}
    assert rows[1]["q_keep"] is False  # empty text fails the gate, no crash


def test_empty_queries_topk_returns_empty(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    empty_q = corpus.filter(F.col("vec_id") < 0)
    assert SIM.brute_force_topk(corpus, empty_q, k=2).count() == 0
    qc = SIM.quantize_embeddings(corpus)
    assert SIM.quantized_topk(qc, empty_q, k=2).count() == 0


def test_empty_corpus_centroids_and_consumers(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    cents = SIM.train_ivf_centroids(empty, n_centroids=4)
    assert isinstance(cents, np.ndarray) and len(cents) == 0
    # dedup over an empty frame returns the empty frame, not a crash
    assert SIM.semantic_dedup(empty, n_centroids=4).count() == 0


def test_mixture_rates_zero_token_stratum(spark):
    from go_pq_cdc_elasticsearch_spark.operators.sampling import mixture_rates

    df = spark.createDataFrame(
        [("en", 0), ("en", 0), ("de", 100)], "lang string, n_tok long"
    )
    rows = {
        r["lang"]: r["rate"]
        for r in mixture_rates(
            df, {"en": 0.5, "de": 0.5}, 50, "lang", "n_tok"
        ).collect()
    }
    assert rows["en"] is None  # zero tokens: NULL rate, not DIVIDE_BY_ZERO
    assert 0 < rows["de"] <= 1.0


def test_audio_features_zero_frame_wav():
    from go_pq_cdc_elasticsearch_spark.operators import codecs

    blob = codecs.encode_wav(np.zeros((0, 1), dtype=np.int16))
    feats = codecs.decode_features(blob, 8)
    assert feats is not None and len(feats) == 8
    assert feats[0] == 0.0  # n_samples


def test_resize_images_null_content(spark):
    from go_pq_cdc_elasticsearch_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [(1, "img", None, None)], MM.MEDIA_SCHEMA
    )
    out = MM.resize_images(media, 2, 2, decode_stub=True).collect()
    assert len(out) == 1  # stub path; the real path guards bytes(None)


def test_salted_join_rejects_outer_and_tolerates_maps(spark):
    from go_pq_cdc_elasticsearch_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [("a", 1, {"k": "v"})], "k string, lv int, payload map<string,string>"
    )
    right = spark.createDataFrame([("a", 10), ("b", 20)], "k string, rv int")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="outer"):
        salted_join(left, right, ["k"], how="full")
    # a MAP column on the left (the CDC envelope case) must not crash the
    # salt hash; left-join parity with the unsalted join
    got = {(r["k"], r["lv"], r["rv"]) for r in salted_join(left, right, ["k"], how="left").collect()}
    want = {
        (r["k"], r["lv"], r["rv"])
        for r in left.join(right, ["k"], "left").collect()
    }
    assert got == want


def test_asof_join_null_keys_do_not_match(spark):
    from go_pq_cdc_elasticsearch_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, 10), (1, 10)], "user_id int, lts int"
    )
    right = spark.createDataFrame(
        [(None, 5), (1, 7)], "user_id int, rts int"
    )
    got = {
        r["user_id"]: r["asof_ts"]
        for r in asof_join(left, right, ["user_id"], "lts", "rts").collect()
    }
    # SQL equi-join: NULL never equals NULL — no inherited timestamp
    assert got[None] is None and got[1] == 7


def test_actions_from_envelope_custom_index_col(spark):
    from go_pq_cdc_elasticsearch_spark import model
    from go_pq_cdc_elasticsearch_spark.sink.actions import actions_from_envelope

    env = spark.createDataFrame(
        [(1, "INSERT", {"id": "7", "v": "x"}, None, "idx-a")],
        "seq long, op string, new_data map<string,string>, "
        "old_data map<string,string>, target string",
    )
    out = actions_from_envelope(env, index_col="target")
    assert "index" in out.columns  # ACTION_SCHEMA contract
    assert out.collect()[0]["index"] == "idx-a"


def test_bm25_duplicate_query_terms_weighted(spark):
    from go_pq_cdc_elasticsearch_spark.operators.ranking import bm25_topk

    docs = spark.createDataFrame(
        [(1, "merge sort tree"), (2, "vector index scan")],
        "doc_id long, text string",
    )
    s1 = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["merge", "vector"]).collect()}
    s2 = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["merge", "merge", "vector"]).collect()}
    assert s2[1] > s1[1]  # doubled term contributes twice
    assert s2[2] == s1[2]


def test_zorder_null_maps_to_cell_zero(spark):
    from go_pq_cdc_elasticsearch_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(None,), (0.0,), (100.0,)], "x double")
    got = [
        r["z"]
        for r in df.select(
            zorder_key([F.col("x")], [(0.0, 100.0)], bits=4).alias("z")
        ).collect()
    ]
    assert got[0] == got[1] == 0  # NULL clusters with the MIN cell
    assert got[2] == 15


def test_topk_zero_norm_vectors_score_zero_not_nan(spark):
    """An all-zero embedding used to produce 0/0=NaN sims, and Spark's
    descending sort ranks NaN above every real double — so one zero
    vector ranked #1 for every query. Zero-norm rows (corpus or query
    side) must score 0.0 and never enter a top-k over positive sims."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 0.0]),  # zero corpus vector
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 0.0])],  # 11 = zero query vector
        "vec_id long, embedding array<double>",
    )
    got = SIM.brute_force_topk(corpus, queries, k=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r)
    top_q10 = sorted(by_q[10], key=lambda r: r["rank"])
    assert [r["vec_id"] for r in top_q10] == [1, 2]  # zero vec not ranked 1st
    assert all(not np.isnan(r["sim"]) for r in got)
    assert all(r["sim"] == 0.0 for r in by_q[11])  # zero query: all sims 0


def test_quantized_topk_zero_query_no_nan(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5])], "vec_id long, embedding array<double>"
    )
    qcorpus = SIM.quantize_embeddings(corpus)
    queries = spark.createDataFrame(
        [(10, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = SIM.quantized_topk(qcorpus, queries, k=2).collect()
    assert got and all(r["sim"] == 0.0 for r in got)


def test_ivf_topk_empty_corpus_returns_empty(spark):
    corpus = spark.createDataFrame([], "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert SIM.ivf_topk(corpus, queries, k=2).collect() == []


def test_ivf_tolerates_malformed_embeddings_everywhere(spark):
    """Review r7: one NULL/empty/ragged embedding in the training sample
    crashed train_ivf_centroids on the driver (before the hardened
    scorers ever ran), and one malformed QUERY vector crashed ivf_topk —
    while brute force and LSH skip them. All three layers must tolerate:
    training excludes them, assignment NULLs their cell, queries skip."""
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, None),
            (4, []), (5, [1.0, 0.0, 9.9]),  # NULL, empty, ragged
            (6, [0.7, 0.7]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = SIM.train_ivf_centroids(corpus, n_centroids=2)
    assert cents.shape[1] == 2  # the dominant dimension won
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, None), (12, []), (13, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = SIM.ivf_topk(corpus, queries, k=2, n_centroids=2, n_probe=2)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["qid"], []).append(r["vec_id"])
    assert 10 in by_q and by_q[10]  # the healthy query answers
    assert set(by_q) == {10}  # malformed queries skipped, not crashed


def test_with_ivf_cell_preserves_input_types(spark):
    """Review r7: the hardcoded array<float> output schema silently
    narrowed double embeddings, so downstream cosine thresholds ran on
    float32-truncated copies."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    cents = SIM.train_ivf_centroids(corpus, n_centroids=2)
    out = SIM.with_ivf_cell(corpus, cents)
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)[
        "embedding"
    ] == "array<double>"


def test_empty_database_claim_queries_do_not_crash(spark, tmp_path):
    """In-suite pin of the empty_rel variant's crash class: the bounded-
    claim queries whose guards divide/sum over data-derived counts must
    run on a COMPLETELY empty database and produce their defined answers
    (found live: approx-distinct died with ANSI DIVIDE_BY_ZERO, approx-
    percentile's claims went three-valued NULL)."""
    import pyarrow.parquet as pq

    from go_pq_cdc_elasticsearch_spark.catalog import TABLES, table_path
    from go_pq_cdc_elasticsearch_spark.sql import EXT_REGISTRY, REGISTRY

    src = "/root/testdata/sf0.001"
    for name in TABLES:
        t = pq.read_table(table_path(src, name)).slice(0, 0)
        pq.write_table(t, table_path(str(tmp_path), name))

    r = REGISTRY["q_s10_count_distinct"].spark(spark, str(tmp_path)).collect()
    assert [row["n"] for row in r] == [0]
    r = EXT_REGISTRY["q_s10_approx_distinct"].spark(spark, str(tmp_path)).collect()
    assert len(r) == 1 and r[0]["n_exact"] == 0 and r[0]["within_3sigma"] is True
    r = EXT_REGISTRY["q_s26_approx_percentile"].spark(spark, str(tmp_path)).collect()
    assert len(r) == 1 and r[0]["n"] == 0
    assert r[0]["rank_ok_p50"] is True and r[0]["rank_ok_p95"] is True
    # Spark's grouping sets emit NO rows over empty input — the engine
    # semantics the oracles pin with HAVING count(*) > 0
    assert REGISTRY["q_s11_rollup"].spark(spark, str(tmp_path)).count() == 0
    assert EXT_REGISTRY["q_s28_cube"].spark(spark, str(tmp_path)).count() == 0
