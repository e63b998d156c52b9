"""Deterministic sampling + sequence packing (training-pipeline ops)."""

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.operators.sampling import (
    hash_sample,
    pack_sequences,
    stratified_hash_sample,
)

SF = "/root/testdata/sf0.01"


def test_hash_sample_deterministic_and_stable_under_repartition(spark):
    docs = load_table(spark, SF, "documents")
    a = {r["doc_id"] for r in hash_sample(docs, 0.2, ["doc_id"]).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(13), 0.2, ["doc_id"]).collect()
    }
    assert a == b  # layout-independent: same set every time
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n  # roughly the requested rate


def test_hash_sample_is_subset_monotone(spark):
    # raising the rate only ADDS rows (bucket thresholds nest) — lets a
    # pipeline grow a sample without resampling everything
    docs = load_table(spark, SF, "documents")
    small = {r["doc_id"] for r in hash_sample(docs, 0.1, ["doc_id"]).collect()}
    big = {r["doc_id"] for r in hash_sample(docs, 0.4, ["doc_id"]).collect()}
    assert small <= big


def test_stratified_rates(spark):
    docs = load_table(spark, SF, "documents")
    out = stratified_hash_sample(
        docs, rates={"en": 1.0, "de": 0.0}, strata_col="lang", key_cols=["doc_id"]
    )
    got = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert got == {"en"}  # de sampled at 0, others dropped entirely
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # rate 1.0 keeps every row


def test_pack_sequences_invariants(spark):
    budget = 256
    docs = load_table(spark, SF, "documents").withColumn(
        "n_tok", F.size(F.split("text", " ")).cast("long")
    )
    packed = pack_sequences(
        docs, budget, token_col="n_tok", order_col="doc_id", partition_col="source"
    ).collect()
    by_part: dict[str, list] = {}
    for r in sorted(packed, key=lambda r: (r["source"], r["doc_id"])):
        by_part.setdefault(r["source"], []).append(r)
    for rows in by_part.values():
        cum = 0
        for r in rows:
            assert r["pack_id"] == cum // budget  # boundary-chunk semantics
            assert r["pack_tokens"] == cum % budget
            cum += r["n_tok"]
        # pack ids are dense and monotone within a partition
        ids = [r["pack_id"] for r in rows]
        assert ids == sorted(ids)


def test_hash_bucket_null_components_stay_distinct(spark):
    """Review r6: concat_ws drops NULL args AND their separator, so keys
    differing only in NULL placement collided into one bucket and always
    shared a keep/drop decision. The per-component sentinel keeps the key
    encoding injective; single non-NULL columns hash as before (the
    oracle-twin form)."""
    from go_pq_cdc_elasticsearch_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame(
        [("x", None, "y"), ("x", "y", None), (None, None, None), ("", "", "")],
        "a string, b string, c string",
    )
    got = [r["b_"] for r in df.select(hash_bucket("a", "b", "c").alias("b_")).collect()]
    # the two NULL-placement twins must NOT be forced equal; all-NULL and
    # all-empty must differ too (md5('') collapse)
    assert got[0] != got[1]
    assert got[2] != got[3]
    # single non-null key column: unchanged vs the plain concat_ws form
    one = spark.createDataFrame([(7,)], "doc_id long")
    from pyspark.sql import functions as F
    from go_pq_cdc_elasticsearch_spark.operators.sampling import SAMPLE_BUCKETS
    from go_pq_cdc_elasticsearch_spark.operators.dedup import _hash64

    expect = one.select(
        F.pmod(_hash64(F.col("doc_id").cast("string")), F.lit(SAMPLE_BUCKETS)).alias("e")
    ).first()["e"]
    assert one.select(hash_bucket("doc_id").alias("b_")).first()["b_"] == expect


def test_pack_sequences_rejects_nonpositive_budget(spark):
    """Review r7: budget=0 was DIVIDE_BY_ZERO under ANSI (mid-stage) and
    silent NULL pack ids without; negatives gave negative ids."""
    import pytest

    docs = load_table(spark, SF, "documents").withColumn("n_tok", F.lit(1))
    for bad in (0, -5):
        with pytest.raises(ValueError, match="budget"):
            pack_sequences(docs, bad, token_col="n_tok")


def test_chunk_documents_rejects_negative_overlap(spark):
    """Review r7: stride > chunk_tokens passed the stride-only check and
    emitted past-the-end chunks with negative n_tok_chunk."""
    import pytest

    from go_pq_cdc_elasticsearch_spark.operators.lm import chunk_documents

    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=-8)


def test_mixture_sample_tolerates_rate_column_on_input(spark):
    """Review r7: the temp rate column is __-prefixed like every other
    operator's; a caller frame already carrying 'rate' used to raise
    AMBIGUOUS_REFERENCE at planning time."""
    from go_pq_cdc_elasticsearch_spark.operators.sampling import mixture_sample

    docs = (
        load_table(spark, SF, "documents")
        .withColumn("n_tok", F.size(F.split("text", " ")).cast("long"))
        .withColumn("rate", F.lit(0.5))  # caller's own column, kept intact
    )
    out = mixture_sample(
        docs, {"en": 1.0}, budget_tokens=10_000,
        strata_col="lang", token_col="n_tok", key_cols=["doc_id"],
    )
    assert out.count() > 0
    assert "rate" in out.columns  # the caller's column survives untouched
    assert out.select(F.min("rate"), F.max("rate")).first() == (0.5, 0.5)


def test_hash_bucket_refuses_empty_keys_and_pack_div_exact(spark):
    """Review r8: (a) zero key columns hashed every row into ONE constant
    bucket — a 'keep 50%' sample deterministically returned all or
    nothing with no error; (b) pack_id used a double division whose
    quotient rounds beyond ~2^53 cumulative tokens (the repo's documented
    floor(bigint/N) trap) — now exact integral div like the oracle's //;
    (c) '__pc' is a reserved name like cdc_dedup's '__rn'."""
    import pytest

    from go_pq_cdc_elasticsearch_spark.operators.sampling import (
        hash_sample,
        pack_sequences,
    )

    df = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, n_tok long")
    with pytest.raises(ValueError, match="at least one key column"):
        hash_sample(df, 0.5, [])
    with pytest.raises(ValueError, match="reserves the column name"):
        pack_sequences(df.withColumn("__pc", F.lit(1)), budget=512,
                       token_col="n_tok", order_col="doc_id")
    # exactness at the double-rounding boundary: cumulative 2^53+1 tokens
    big = spark.createDataFrame(
        [(1, (1 << 53) + 1), (2, 10)], "doc_id long, n_tok long"
    )
    out = {r["doc_id"]: r["pack_id"] for r in pack_sequences(
        big, budget=512, token_col="n_tok", order_col="doc_id").collect()}
    assert out[2] == ((1 << 53) + 1) // 512  # exact, not double-rounded
