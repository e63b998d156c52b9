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
