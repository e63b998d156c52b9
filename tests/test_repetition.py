"""Repetition metrics / quality gate / mixture sampling / semantic dedup."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.operators.repetition import (
    quality_gate,
    repetition_filter,
    repetition_metrics,
)
from go_pq_cdc_elasticsearch_spark.operators.sampling import (
    hash_sample,
    mixture_rates,
    mixture_sample,
)
from go_pq_cdc_elasticsearch_spark.operators.similarity import (
    brute_force_topk,
    semantic_dedup,
)

SF = "/root/testdata/sf0.01"


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_repetition_metrics_hand_computed(spark):
    # "x y x y x y": 2-grams = [x y, y x, x y, y x, x y] -> top "x y" c=3,
    # gram chars 3, norm chars 11 -> frac 9/11. No duplicated 5-gram
    # (positions 1..2 are distinct) -> dup_5 = 0.
    df = _docs(spark, ["x y x y x y"])
    m = repetition_metrics(df).collect()[0]
    assert m["n_chars_norm"] == 11
    assert abs(m["top_2_char_frac"] - 9 / 11) < 1e-9
    assert m["dup_5_frac"] == 0.0


def test_repetition_metrics_degenerate_doc(spark):
    # 12 identical words: every n-gram position repeats -> dup fractions 1;
    # top-2 coverage = 11 occurrences * 3 chars / 23 norm chars.
    df = _docs(spark, [" ".join(["a"] * 12)])
    m = repetition_metrics(df).collect()[0]
    assert m["dup_5_frac"] == 1.0
    assert m["dup_10_frac"] == 1.0
    assert abs(m["top_2_char_frac"] - (11 * 3) / 23) < 1e-9


def test_repetition_metrics_short_doc_all_zero(spark):
    m = repetition_metrics(_docs(spark, ["hello"])).collect()[0]
    assert m["top_2_char_frac"] == 0.0
    assert m["dup_10_frac"] == 0.0


def test_repetition_filter_drops_spam_keeps_prose(spark):
    spam = " ".join(["buy now"] * 40)
    prose = " ".join(f"w{i}" for i in range(80))
    flags = {
        r["doc_id"]: r["rep_keep"]
        for r in repetition_filter(_docs(spark, [spam, prose])).collect()
    }
    assert flags[0] is False
    assert flags[1] is True


def test_quality_gate_rule_attribution(spark):
    short = "too short"
    no_stop = " ".join(f"tok{i}" for i in range(30))
    good = "the quick brown fox jumps over a lazy dog " * 5
    rows = {
        r["doc_id"]: r
        for r in quality_gate(_docs(spark, [short, no_stop, good])).collect()
    }
    assert rows[0]["r_min_words"] is False and rows[0]["q_keep"] is False
    assert rows[1]["r_stopword"] is False and rows[1]["q_keep"] is False
    assert rows[2]["q_keep"] is True


def test_mixture_rates_formula(spark):
    docs = (
        load_table(spark, SF, "documents")
        .withColumn("n_tok", F.size(F.split("text", " ")).cast("long"))
        .withColumn("k", F.col("doc_id").cast("string"))
    )
    targets = {"en": 0.5, "de": 0.5}
    budget = 10_000
    rates = {
        r["lang"]: r
        for r in mixture_rates(docs, targets, budget, "lang", "n_tok").collect()
    }
    totals = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang").agg(F.sum("n_tok").alias("t")).collect()
    }
    for g, w in targets.items():
        expect = min(1.0, w * budget / totals[g])
        assert abs(rates[g]["rate"] - expect) < 1e-12
        assert rates[g]["group_tokens"] == totals[g]
    # strata without a target weight are absent
    assert set(rates) == set(targets)


def test_mixture_sample_deterministic_subset_of_hash_sample(spark):
    docs = (
        load_table(spark, SF, "documents")
        .withColumn("n_tok", F.size(F.split("text", " ")).cast("long"))
        .withColumn("k", F.col("doc_id").cast("string"))
    )
    targets = {"en": 0.6, "de": 0.4}
    kept = mixture_sample(docs, targets, 15_000, "lang", "n_tok", ["k"])
    a = {r["doc_id"] for r in kept.collect()}
    b = {r["doc_id"] for r in kept.collect()}
    assert a == b  # replay-stable
    # every kept row would also be kept by a plain hash_sample at rate 1.0
    # restricted to targeted strata (bucket thresholds nest)
    allowed = {
        r["doc_id"]
        for r in hash_sample(
            docs.filter(F.col("lang").isin(*targets)), 1.0, ["k"]
        ).collect()
    }
    assert a <= allowed


def test_select_to_budget_greedy_prefix(spark):
    rows = [
        Row(doc_id=i, grp="g", n_tok=10, q=float(10 - i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    from go_pq_cdc_elasticsearch_spark.operators.sampling import select_to_budget

    kept = select_to_budget(
        df, 35, token_col="n_tok", rank_col="q", partition_col="grp"
    )
    # quality desc = doc_id asc here; 35-token budget fits exactly 3 docs
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2]
    # budget >= total keeps everything
    assert select_to_budget(
        df, 1000, token_col="n_tok", rank_col="q", partition_col="grp"
    ).count() == 10


def test_semantic_dedup_exact_anchor_and_groups(spark):
    # three duplicate-groups of vectors (exact copies) + one singleton;
    # n_centroids=1 => exact all-pairs dedup: one representative per group.
    base = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
    rows = []
    vid = 0
    for g, v in enumerate(base):
        for _ in range(g + 1):  # group sizes 1, 2, 3
            rows.append(Row(vec_id=vid, embedding=[float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows)
    kept = semantic_dedup(df, tau=0.999, n_centroids=1)
    ids = sorted(r["vec_id"] for r in kept.collect())
    assert ids == [0, 1, 3]  # min id of each duplicate group

    # clustered variant on real embeddings: never drops MORE than the
    # exact variant (cell boundaries only lose recall, never add pairs)
    emb = load_table(spark, SF, "embeddings").limit(300)
    exact_kept = semantic_dedup(emb, tau=0.99, n_centroids=1).count()
    clustered_kept = semantic_dedup(emb, tau=0.99, n_centroids=8).count()
    assert clustered_kept >= exact_kept


def test_semantic_dedup_representative_has_witness(spark):
    # every dropped vector must have cosine >= tau to SOME kept vector
    # (its component representative chain) — checked via brute force top-1
    emb = load_table(spark, SF, "embeddings").limit(200)
    kept = semantic_dedup(emb, tau=0.95, n_centroids=1)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    dropped = all_ids - kept_ids
    if not dropped:
        return  # nothing dropped at this tau on this data — vacuously fine
    queries = emb.filter(F.col("vec_id").isin(*sorted(dropped)))
    top = brute_force_topk(emb, queries, k=len(all_ids) - 1)
    best = {
        r["qid"]: r["sim"]
        for r in top.filter(F.col("rank") == 1).collect()
    }
    for d in dropped:
        assert best[d] >= 0.95


def test_overlapping_top_and_dup_ns_not_double_counted(spark):
    """An n present in BOTH top_ns and dup_ns exploded its grams twice in
    the union, doubling every count: dup_n_frac read 1.0 on fully unique
    text (confirmed by execution, review r5)."""
    from go_pq_cdc_elasticsearch_spark.operators.repetition import (
        repetition_metrics,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    both = repetition_metrics(df, top_ns=(3,), dup_ns=(3,)).first()
    disjoint = repetition_metrics(df, top_ns=(3,), dup_ns=(4,)).first()
    assert both["dup_3_frac"] == 0.0  # nothing repeats
    assert abs(both["top_3_char_frac"] - disjoint["top_3_char_frac"]) < 1e-12
