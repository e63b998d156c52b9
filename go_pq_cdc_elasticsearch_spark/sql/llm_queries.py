"""LLM-pipeline declared queries (SURVEY.md §2.2 Q-L*).

Dedup family, similarity search and text analysis over ``documents`` /
``embeddings``. Hashes are md5-derived so the DuckDB oracle computes the
*identical* signatures/buckets — the whole pipeline is value-checked, not
just row-counted. Generated SQL (simhash, langid) is built from the same
constants as the Spark expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.functions import text as TX
from go_pq_cdc_elasticsearch_spark.functions.rounding import pround
from go_pq_cdc_elasticsearch_spark.functions.rounding import pround_sql as PR
from go_pq_cdc_elasticsearch_spark.operators import dedup as DD
from go_pq_cdc_elasticsearch_spark.operators import similarity as SIM
from go_pq_cdc_elasticsearch_spark.sql.registry import ext_query, query

# ---- shared oracle SQL fragments (DuckDB dialect) --------------------------

# translate-fold, not lower(): see functions/text.py::ascii_lower (r7)
# the whitespace class is spelled out via TX.PORTABLE_WS: Java's \\s
# includes \\x0B, RE2's does not (verified live, review r8) — one
# constant shared with the engine side
NORM_SQL = (
    "trim(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
    f"'abcdefghijklmnopqrstuvwxyz'), '[{TX.PORTABLE_WS}]+', ' ', 'g'))"
)
WORDS_SQL = f"string_split({NORM_SQL}, ' ')"
GRAMS_SQL = (
    "list_transform(range(1, len(w)-1), i -> concat(w[i],' ',w[i+1],' ',w[i+2]))"
)
# NULL keys coalesce to the same \x00 sentinel operators/sampling.py's
# hash_bucket uses: md5(NULL) is NULL and DuckDB's concat SKIPS the NULL,
# so the bucket expression collapsed to the literal '0x' and the BIGINT
# cast errored out the whole oracle on one NULL doc_id (proven by the
# nulls_rel variant, review r8). For never-NULL inputs (grams, literals)
# the coalesce is a no-op.
HASH_SQL = "CAST(concat('0x', substr(md5(coalesce({x}, chr(0))), 1, 8)) AS BIGINT)"
# Defective-vector contract (review r8, proven by the nulls_rel variant):
# a pair involving a NULL element, mismatched lengths, or a NaN result has
# NO similarity — NULL, which never ranks and never crosses a threshold.
# The bare form diverged from the engine three ways: DuckDB's list_sum
# SKIPS NULL elements (partial dot where Spark's fold is NULL), list_zip
# pads ragged pairs with NULLs (partial dot again), and NaN compares as
# larger-than-everything in a DuckDB threshold/order while the engine
# excludes it. The guard textually inlines the raw fold twice (condition
# + THEN); accepted: this doubles ORACLE-side cost in tools/check.py
# only (the engine never runs this SQL), and splicing a named
# subexpression into the seven call sites' differing SQL shapes isn't
# worth the check-tool seconds.
_COS_RAW = (
    "(list_sum(list_transform(list_zip({a}, {b}), x -> CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform({a}, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))"
    " * sqrt(list_sum(list_transform({b}, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))))"
)
COS_SQL = (
    "(CASE WHEN len({a}) = len({b})"
    " AND len(list_filter({a}, v -> v IS NULL)) = 0"
    " AND len(list_filter({b}, v -> v IS NULL)) = 0"
    " AND NOT isnan(coalesce(" + _COS_RAW + ", 0.0))"
    " THEN " + _COS_RAW + " END)"
)
# portable 6dp round of a similarity column (see functions/rounding.py —
# in-engine round() diverges between engines on decimal-tie doubles)
PSIM6 = PR("sim", 6)


@query(
    "q_l1_exact_dedup",
    oracle=f"""
        SELECT count(*) AS n_docs,
               count(DISTINCT {NORM_SQL}) AS n_unique
        FROM documents
    """,
    doc="Exact dedup cardinality on the normalized text (hash-groupBy; at "
    "scale the group key is the md5 fingerprint, not the text).",
)
def q_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(TX.normalize_text(F.col("text"))).alias("n_unique"),
    )


@query(
    "q_l2_text_stats",
    oracle="""
        SELECT lang, count(*) AS n,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        FROM documents GROUP BY lang
    """,
    doc="Corpus language/length statistics.",
)
def q_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average as exact-integer-sum / count, ONE double division: n_chars
    is integral, so the sum is exactly representable (< 2^53) and a single
    correctly-rounded IEEE division is bit-identical on both engines. The
    earlier avg(DECIMAL) form was the recorded avg-divergence trap: DuckDB
    computes decimal avg in DOUBLE while Spark divides exactly in decimal
    and HALF_UP-quantizes before the cast — a group mean within ~5e-15 of
    a rounding midpoint landed on adjacent doubles (review r5)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("n_chars").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_chars"),
    )


@query(
    "q_l3_cosine_topk",
    oracle=f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        scored AS (
            SELECT q.qid, e.vec_id,
                   {COS_SQL.format(a="q.qe", b="e.embedding")} AS sim
            FROM q JOIN embeddings e ON e.vec_id <> q.qid
        )
        SELECT qid, vec_id, {PSIM6} AS sim, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
            FROM scored)
        WHERE rank <= 5
    """,
    doc="Brute-force cosine top-k similarity search (exact baseline; "
    "broadcast query set, no shuffle of the corpus except final top-k).",
)
def q_l3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numpy/BLAS selects top-4k candidates (the 100 TB shape), then the
    final 5 are RE-RANKED with the declarative fold cosine — bit-identical
    to the oracle's list_sum fold, so near-tied candidates cannot swap
    rank/membership on BLAS-vs-fold summation noise (~1e-15; a regenerated
    seed could land two corpus vectors inside it). The 4x margin makes a
    fold-top-5 candidate missing from the BLAS top-20 need fifteen
    intervening vectors ALL within that noise — not a real event."""
    from go_pq_cdc_elasticsearch_spark.operators.dedup import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    cand = SIM.brute_force_topk(emb, queries_df, k=20).select("qid", "vec_id")
    c = emb.select("vec_id", F.col("embedding").alias("__cv"))
    q = queries_df.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("__qv")
    )
    scored = (
        cand.join(c, "vec_id")
        .join(F.broadcast(q), "qid")
        .withColumn("sim", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "vec_id", pround("sim", 6).alias("sim"), "rank")
    )


def _minhash_family_sql(j: int) -> str:
    """DuckDB twin of operators/dedup.py::_family — identical (a,b,p)
    constants, one md5 per shingle then integer mixing."""
    from go_pq_cdc_elasticsearch_spark.operators.dedup import (
        MERSENNE31,
        family_coeffs,
    )

    a, b = family_coeffs(j)
    h = HASH_SQL.format(x="s")
    return f"list_min(list_transform(grams, s -> (({a} * {h} + {b}) % {MERSENNE31})))"


def _minhash_oracle(k: int = 16, bands: int = 8) -> str:
    # n_docs is count(DISTINCT doc_id): the Spark side counts DOCUMENTS
    # (countDistinct over band rows), and a duplicated doc row made a
    # bare count(*) diverge (dup_rel variant)
    rows = k // bands
    sig_entries = ",\n            ".join(
        _minhash_family_sql(j) for j in range(k)
    )
    band_cols = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows))
        + f")) AS band_{b}"
        for b in range(bands)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band_{b} AS band_hash FROM banded"
        for b in range(bands)
    )
    return f"""
        WITH base AS (
            SELECT doc_id, {WORDS_SQL} AS w FROM documents
        ), g AS (
            SELECT doc_id, {GRAMS_SQL} AS grams FROM base WHERE len(w) >= 3
        ), sig_t AS (
            SELECT doc_id, [{sig_entries}] AS sig FROM g
        ), banded AS (
            SELECT doc_id, {band_cols} FROM sig_t
        ), bands AS ({band_union}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id
        )
        SELECT (SELECT count(DISTINCT doc_id) FROM g) AS n_docs,
               (SELECT count(DISTINCT band_hash) FROM bands) AS n_buckets,
               (SELECT count(*) FROM pairs) AS n_candidate_pairs
    """


@query(
    "q_l4_minhash_lsh",
    oracle=_minhash_oracle(),
    doc="MinHash(16 perms)+LSH(8 bands of 2) near-dup candidate generation: "
    "signature/bucket values are md5-derived, so the oracle computes the "
    "identical buckets — full value parity, not just counts.",
)
def q_l4(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # docs with <3 words simply produce no shingles (no pre-filter pass);
    # three consumers (self-join x2 + counts): persist the band rows so
    # signatures are computed once (tiny: 8 rows/doc of (id, idx, hash);
    # stays cached for the session — bounded, unlike a gram-set cache)
    band_rows = DD.minhash_band_rows(docs, k=16, bands=8).persist()
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    counts = band_rows.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("band_hash").alias("n_buckets"),
    )
    n_pairs = pairs.agg(F.count(F.lit(1)).alias("n_candidate_pairs"))
    return counts.crossJoin(n_pairs)


@ext_query(
    "q_l5_jaccard_adjacent",
    oracle=f"""
        WITH base AS (
            SELECT doc_id,
                   list_distinct({GRAMS_SQL}) AS g
            FROM (SELECT doc_id, {WORDS_SQL} AS w FROM documents)
            WHERE len(w) >= 3
        )
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               {PR('''CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                     / len(list_distinct(a.g || b.g))''', 6)} AS jac
        FROM base a JOIN base b ON b.doc_id = a.doc_id + 1
    """,
    doc="Exact n-gram Jaccard similarity on candidate pairs (adjacent ids "
    "as the deterministic candidate set; in production the candidates come "
    "from q_l4's LSH buckets).",
)
def q_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.size(TX.words(F.col("text"))) >= 3
    )
    grams = DD.doc_ngram_sets(docs)  # one text pass per doc, staged
    a = grams.select(F.col("doc_id").alias("id1"), F.col("grams").alias("g1"))
    b = grams.select(F.col("doc_id").alias("id2"), F.col("grams").alias("g2"))
    pairs = a.join(b, F.col("id2") == F.col("id1") + 1)
    return pairs.select(
        "id1",
        "id2",
        pround(DD.jaccard_from_sets(F.col("g1"), F.col("g2")), 6).alias("jac"),
    )


@ext_query(
    "q_l6_embedding_neardup",
    oracle=f"""
        WITH pairs AS (
            SELECT a.vec_id AS id1, b.vec_id AS id2,
                   {COS_SQL.format(a="a.embedding", b="b.embedding")} AS sim
            FROM embeddings a JOIN embeddings b
              ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 25
        )
        SELECT id1, id2, {PSIM6} AS sim
        FROM pairs ORDER BY sim DESC, id1, id2 LIMIT 20
    """,
    doc="Embedding-cosine near-dup: top-20 most-similar pairs within a "
    "bounded id window. Implemented as a bucketed equi-join (floor(id/W) "
    "with neighbor probe), NOT a nested-loop range join.",
)
def q_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    win = 25
    # `div`, NOT floor(id/W): the / is a DOUBLE division, so beyond
    # ~2^53/W the bucket id rounds and a (id, id+1) neighbor pair can land
    # TWO buckets apart — invisible to the jb/jb-1 probe while the
    # oracle's exact integer range predicate keeps it (review r7;
    # snowflake-scale ids are in the regeneration vocabulary). div is
    # exact 64-bit integral division; ids are non-negative so div == floor
    # norms factored out of the pair expression (bit-identical — see
    # operators/dedup.py::l2_norm): each side carries its precomputed norm
    # through the bucket join; the ~win pairs per row pay one fold (dot)
    a = emb.select(
        F.col("vec_id").alias("id1"),
        F.col("embedding").alias("e1"),
        DD.l2_norm(F.col("embedding")).alias("n1"),
        F.expr(f"vec_id div {win}").alias("jb"),
    )
    b = emb.select(
        F.col("vec_id").alias("id2"),
        F.col("embedding").alias("e2"),
        DD.l2_norm(F.col("embedding")).alias("n2"),
        F.explode(
            F.array(
                F.expr(f"vec_id div {win}"), F.expr(f"vec_id div {win}") - 1
            )
        ).alias("jb"),
    )
    pairs = a.join(b, "jb").filter(
        (F.col("id2") > F.col("id1")) & (F.col("id2") <= F.col("id1") + win)
    )
    return (
        pairs.select(
            "id1",
            "id2",
            pround(
                DD.cosine_from_norms(
                    F.col("e1"), F.col("e2"), F.col("n1"), F.col("n2")
                ),
                6,
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "id1", "id2")
        .limit(20)
    )


def _simhash_expr_sql() -> str:
    """The 16-bit SimHash as a single per-row expression over ``w`` —
    shared by the standalone oracle and q_l7's row-level compose."""
    h = HASH_SQL.format(x="t")
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(w, t -> CASE WHEN ({h} // {2**b}) % 2 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN {2**b} ELSE 0 END)"
        for b in range(16)
    )
    return f"CAST({bit_terms} AS BIGINT)"


def _simhash_oracle() -> str:
    return f"""
        SELECT doc_id, {_simhash_expr_sql()} AS simhash
        FROM (SELECT doc_id, {WORDS_SQL} AS w FROM documents WHERE doc_id <= 200)
    """


@ext_query(
    "q_l7_simhash",
    oracle=None,  # composed below once _l8/_l9 oracles are defined
    doc="Per-document fingerprint/analysis record: 16-bit SimHash, token "
    "counts, stopword/punct ratios, quality score, md5 fingerprint, "
    "language-ID — q_l8_text_features and q_l9_langid folded in by a "
    "doc_id join (driver 50-entry window; originals stay oracle-checked "
    "locally as extension entries). All values md5-/column-exact vs the "
    "oracle.",
)
def q_l7(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    t = F.col("text")
    return docs.select(
        "doc_id",
        DD.simhash16(t).alias("simhash"),
        TX.token_count_ws(t).alias("tok_ws"),
        TX.token_count_bpe(t).alias("tok_bpe"),
        pround(TX.stopword_ratio(t), 6).alias("stop_ratio"),
        pround(TX.punct_ratio(t), 6).alias("punct_r"),
        pround(TX.quality_score(t), 6).alias("quality"),
        TX.fingerprint(t).alias("fp"),
        TX.lang_id(t).alias("lang_pred"),
    )


# interpolated from the SHARED constants (functions/text.py) like the
# langid oracle — a hardcoded copy would silently fall out of lockstep
# when STOPWORDS/BPE_TOKEN_RE change (review r5)
_STOPWORDS_SQL = "[" + ",".join(f"'{s}'" for s in TX.STOPWORDS) + "]"
_L8_STOP_SQL = f"""CAST(len(list_filter({WORDS_SQL},
                     x -> list_contains({_STOPWORDS_SQL}, x))) AS DOUBLE)
                     / len({WORDS_SQL})"""
_L8_PUNCT_SQL = """CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
                     / length(text)"""
_L8_QUAL_SQL = f"""0.4 * least(len({WORDS_SQL}) / 200.0, 1.0)
                     + 0.3 * (1.0 - {_L8_PUNCT_SQL})
                     + 0.3 * least(5.0 * ({_L8_STOP_SQL}), 1.0)"""
_L8_STOP_PR = PR(_L8_STOP_SQL, 6)
_L8_PUNCT_PR = PR(_L8_PUNCT_SQL, 6)
_L8_QUAL_PR = PR(_L8_QUAL_SQL, 6)


@ext_query(
    "q_l8_text_features",
    oracle=f"""
        SELECT doc_id,
               CAST(len({WORDS_SQL}) AS BIGINT) AS tok_ws,
               CAST(len(regexp_extract_all(text, '{TX.BPE_TOKEN_RE}')) AS BIGINT) AS tok_bpe,
               {_L8_STOP_PR} AS stop_ratio,
               {_L8_PUNCT_PR} AS punct_r,
               {_L8_QUAL_PR} AS quality,
               substr(md5({NORM_SQL}), 1, 16) AS fp
        FROM documents WHERE doc_id <= 200
    """,
    doc="Per-document text features: whitespace & BPE-ish token counts, "
    "stopword/punctuation ratios, heuristic quality score, md5 fingerprint.",
)
def q_l8(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count_ws(t).alias("tok_ws"),
        TX.token_count_bpe(t).alias("tok_bpe"),
        pround(TX.stopword_ratio(t), 6).alias("stop_ratio"),
        pround(TX.punct_ratio(t), 6).alias("punct_r"),
        pround(TX.quality_score(t), 6).alias("quality"),
        TX.fingerprint(t).alias("fp"),
    )


def _langid_expr_sql() -> str:
    """Language-ID argmax as a single per-row expression over ``w`` —
    shared by the standalone oracle and q_l7's row-level compose.
    Seed 0, not -1, matching functions/text.py::lang_id — markerless
    documents must stay 'und' instead of the first language "winning"
    with a 0-hit score."""
    best_lang, best_score = "'und'", "0"
    for lang, markers in TX.LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        score = (
            f"len(list_filter(w, x -> list_contains([{lst}], x)))"
        )
        best_lang = f"(CASE WHEN {score} > {best_score} THEN '{lang}' ELSE {best_lang} END)"
        best_score = f"(CASE WHEN {score} > {best_score} THEN {score} ELSE {best_score} END)"
    return best_lang


def _langid_oracle() -> str:
    return f"""
        SELECT doc_id, {_langid_expr_sql()} AS lang_pred
        FROM (SELECT doc_id, {WORDS_SQL} AS w FROM documents WHERE doc_id <= 200)
    """


@ext_query(
    "q_l9_langid",
    oracle=_langid_oracle(),
    doc="Marker-word language-ID heuristic (argmax of per-language evidence "
    "with deterministic tie order).",
)
def q_l9(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    return docs.select("doc_id", TX.lang_id(F.col("text")).alias("lang_pred"))


@ext_query(
    "q_l12_pack_sequences",
    oracle=f"""
        SELECT doc_id, source, pack_id, pack_tokens FROM (
            SELECT doc_id, source,
                   CAST(coalesce(sum(n_tok) OVER w, 0) // 512 AS BIGINT) AS pack_id,
                   CAST(coalesce(sum(n_tok) OVER w, 0) % 512 AS BIGINT) AS pack_tokens
            FROM (SELECT doc_id, source, len({WORDS_SQL}) AS n_tok
                  FROM documents)
            WINDOW w AS (PARTITION BY source ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        WHERE doc_id <= 200
    """,
    doc="Sequence packing for training loaders: docs chunked into "
    "512-token packs per source shard (cumsum window partitioned by "
    "source — never a single global window at scale).",
)
def q_l12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.sampling import pack_sequences

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(TX.words(F.col("text"))).cast("long")
    )
    packed = pack_sequences(
        docs, budget=512, token_col="n_tok", order_col="doc_id", partition_col="source"
    )
    return packed.filter(F.col("doc_id") <= 200).select(
        "doc_id", "source", "pack_id", "pack_tokens"
    )


@ext_query(
    "q_l13_hash_sample",
    oracle=f"""
        SELECT lang, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
        FROM (
            SELECT lang, doc_id,
                   {HASH_SQL.format(x="CAST(doc_id AS VARCHAR)")} % 1000000 AS bucket
            FROM documents)
        WHERE bucket < (CASE lang WHEN 'en' THEN 100000
                                  WHEN 'de' THEN 500000
                                  WHEN 'fr' THEN 500000 ELSE -1 END)
        GROUP BY lang
    """,
    doc="Deterministic stratified sampling (md5-bucket thresholds, no RNG "
    "state): retry/replay-stable, pure pushable predicate at scale — keep "
    "10% of the dominant language, 50% of two others, drop the rest.",
)
def q_l13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.sampling import (
        stratified_hash_sample,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "k", F.col("doc_id").cast("string")
    )
    sampled = stratified_hash_sample(
        docs, rates={"en": 0.1, "de": 0.5, "fr": 0.5}, strata_col="lang", key_cols=["k"]
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@ext_query(
    "q_l14_winnowing",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, {WORDS_SQL} AS w FROM documents WHERE doc_id <= 200
        ), g AS (
            SELECT doc_id, {GRAMS_SQL} AS grams FROM base WHERE len(w) >= 3
        ), e0 AS (
            SELECT doc_id, grams, len(grams) AS n_g,
                   unnest(range(1, len(grams) + 1)) AS pos
            FROM g
        ), e AS (
            SELECT doc_id, pos, n_g, {HASH_SQL.format(x="grams[pos]")} AS h
            FROM e0
        ), m AS (
            SELECT doc_id, pos, n_g,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM e
        ), sel AS (
            SELECT DISTINCT doc_id, fp FROM m WHERE pos <= n_g - 3
        )
        SELECT doc_id, count(*) AS n_fp,
               md5(string_agg(CAST(fp AS VARCHAR), ',' ORDER BY fp)) AS fp_digest
        FROM sel GROUP BY doc_id
    """,
    doc="Winnowing rolling-hash fingerprints (Schleimer et al., SIGMOD'03): "
    "word-3-gram hashes, window w=4 minima, distinct selected set. Digest "
    "is md5 over the sorted fingerprint list — full value parity with the "
    "oracle's identical window-min formulation.",
)
def q_l14(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    sel = DD.winnow_fingerprints(docs, n=3, w=4)
    return sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_set(F.col("fp"))),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("fp_digest"),
    )


@ext_query(
    "q_l15_winnow_candidates",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, {WORDS_SQL} AS w FROM documents WHERE doc_id <= 200
        ), g AS (
            SELECT doc_id, {GRAMS_SQL} AS grams FROM base WHERE len(w) >= 3
        ), e0 AS (
            SELECT doc_id, grams, len(grams) AS n_g,
                   unnest(range(1, len(grams) + 1)) AS pos
            FROM g
        ), e AS (
            SELECT doc_id, pos, n_g, {HASH_SQL.format(x="grams[pos]")} AS h
            FROM e0
        ), m AS (
            SELECT doc_id, pos, n_g,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM e
        ), sel AS (
            SELECT DISTINCT doc_id, fp FROM m WHERE pos <= n_g - 3
        )
        SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared
        FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 2
    """,
    doc="Span-level duplicate candidates from winnowing: documents sharing "
    ">= 2 selected fingerprints (each shared fingerprint witnesses a shared "
    "w+n-1-word run). The inverted-index self-join shuffles (fp, doc_id) "
    "rows only — the winnowing analog of LSH banding, for substring-level "
    "rather than whole-document near-duplication.",
)
def q_l15(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    sel = DD.winnow_fingerprints(docs, n=3, w=4)
    a = sel.select(F.col("doc_id").alias("id1"), "fp")
    b = sel.select(F.col("doc_id").alias("id2"), F.col("fp").alias("fp2"))
    return (
        a.join(b, (F.col("fp") == F.col("fp2")) & (F.col("id1") < F.col("id2")))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


def _repetition_oracle() -> str:
    """DuckDB twin of operators/repetition.py::repetition_metrics — n-grams
    per n via list slicing, identical tie-break for the top gram."""
    ns = "(VALUES (2),(3),(4),(5),(10))"
    return f"""
        WITH base AS (
            SELECT doc_id, {WORDS_SQL} AS w,
                   CAST(length({NORM_SQL}) AS BIGINT) AS n_chars_norm
            FROM documents WHERE doc_id <= 200
        ), g AS (
            SELECT doc_id, n,
                   unnest(list_transform(range(1, len(w) - n + 2),
                          i -> array_to_string(w[i:i+n-1], ' '))) AS gram
            FROM base CROSS JOIN {ns} t(n)
            WHERE len(w) >= n
        ), c AS (
            SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY doc_id, n, gram
        ), top AS (
            SELECT doc_id, n, CAST(c * length(gram) AS DOUBLE) AS top_chars
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id, n
                      ORDER BY c DESC, length(gram) DESC, gram DESC) AS rn
                  FROM c)
            WHERE rn = 1
        ), dup AS (
            SELECT doc_id, n, sum(c) AS total_pos,
                   coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS dup_pos
            FROM c GROUP BY doc_id, n
        ), per_n AS (
            SELECT top.doc_id, top.n, top.top_chars, dup.total_pos, dup.dup_pos
            FROM top JOIN dup ON dup.doc_id = top.doc_id AND dup.n = top.n
        ), wide AS (
            SELECT doc_id,
                   coalesce(max(CASE WHEN n = 2 THEN top_chars END), 0.0) AS t2,
                   coalesce(max(CASE WHEN n = 3 THEN top_chars END), 0.0) AS t3,
                   coalesce(max(CASE WHEN n = 4 THEN top_chars END), 0.0) AS t4,
                   coalesce(max(CASE WHEN n = 5 THEN
                       CAST(dup_pos AS DOUBLE) / total_pos END), 0.0) AS d5,
                   coalesce(max(CASE WHEN n = 10 THEN
                       CAST(dup_pos AS DOUBLE) / total_pos END), 0.0) AS d10
            FROM per_n GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_chars_norm,
               {PR('coalesce(w.t2 / b.n_chars_norm, 0.0)', 6)} AS top_2_char_frac,
               {PR('coalesce(w.t3 / b.n_chars_norm, 0.0)', 6)} AS top_3_char_frac,
               {PR('coalesce(w.t4 / b.n_chars_norm, 0.0)', 6)} AS top_4_char_frac,
               {PR('coalesce(w.d5, 0.0)', 6)} AS dup_5_frac,
               {PR('coalesce(w.d10, 0.0)', 6)} AS dup_10_frac
        FROM base b LEFT JOIN wide w ON w.doc_id = b.doc_id
    """


@ext_query(
    "q_l16_repetition",
    oracle=_repetition_oracle(),
    doc="Gopher-style repetition metrics (Rae et al. 2021 A1): top-2/3/4-"
    "gram char coverage + duplicate-5/10-gram position fraction, per doc. "
    "Cell-exact vs the oracle's identical formulation.",
)
def q_l16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.repetition import (
        repetition_metrics,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    m = repetition_metrics(docs)
    return m.select(
        "doc_id",
        "n_chars_norm",
        *[pround(f"top_{n}_char_frac", 6).alias(f"top_{n}_char_frac") for n in (2, 3, 4)],
        *[pround(f"dup_{n}_frac", 6).alias(f"dup_{n}_frac") for n in (5, 10)],
    )


def _quality_gate_oracle() -> str:
    n_words = f"len({WORDS_SQL})"
    mean_len = (
        f"CAST(list_sum(list_transform({WORDS_SQL}, x -> length(x))) AS DOUBLE)"
        f" / {n_words}"
    )
    punct = (
        "CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]', '', 'g'))"
        " AS DOUBLE) / length(text)"
    )
    stop = (
        f"len(list_filter({WORDS_SQL}, "
        f"x -> list_contains({_STOPWORDS_SQL}, x)))"
    )
    return f"""
        WITH r AS (
            SELECT source,
                   coalesce({n_words} >= 20, false) AS r_min_words,
                   coalesce({n_words} <= 100000, false) AS r_max_words,
                   coalesce({mean_len} >= 2.0 AND {mean_len} <= 12.0, false) AS r_word_len,
                   coalesce({punct} <= 0.3, false) AS r_symbols,
                   coalesce({stop} > 0, false) AS r_stopword
            FROM documents
        )
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN r_min_words AND r_max_words AND r_word_len
                        AND r_symbols AND r_stopword THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
               CAST(sum(CASE WHEN NOT r_min_words THEN 1 ELSE 0 END) AS BIGINT) AS f_min_words,
               CAST(sum(CASE WHEN NOT r_word_len THEN 1 ELSE 0 END) AS BIGINT) AS f_word_len,
               CAST(sum(CASE WHEN NOT r_symbols THEN 1 ELSE 0 END) AS BIGINT) AS f_symbols,
               CAST(sum(CASE WHEN NOT r_stopword THEN 1 ELSE 0 END) AS BIGINT) AS f_stopword
        FROM r GROUP BY source
    """


@ext_query(
    "q_l17_quality_gate",
    oracle=_quality_gate_oracle(),
    doc="C4/Gopher-style quality gate audit: per-source keep counts and "
    "per-rule failure attribution (pure column predicates — the whole gate "
    "pushes into the scan; no shuffle before the final agg).",
)
def q_l17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.repetition import quality_gate

    docs = load_table(spark, sf_dir, "documents")
    gated = quality_gate(docs)
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("q_keep").cast("int")).cast("long").alias("n_keep"),
        F.sum((~F.col("r_min_words")).cast("int")).cast("long").alias("f_min_words"),
        F.sum((~F.col("r_word_len")).cast("int")).cast("long").alias("f_word_len"),
        F.sum((~F.col("r_symbols")).cast("int")).cast("long").alias("f_symbols"),
        F.sum((~F.col("r_stopword")).cast("int")).cast("long").alias("f_stopword"),
    )


_MIX_TARGETS = {"en": 0.5, "de": 0.3, "fr": 0.2}
_MIX_BUDGET = 20_000


def _mixture_oracle() -> str:
    vals = ", ".join(f"('{g}', {w})" for g, w in sorted(_MIX_TARGETS.items()))
    return f"""
        WITH d AS (
            SELECT doc_id, lang, CAST(len({WORDS_SQL}) AS BIGINT) AS n_tok
            FROM documents
        ), r AS (
            SELECT lang, CAST(sum(n_tok) AS BIGINT) AS group_tokens,
                   least(1.0, t.w * {_MIX_BUDGET}
                         / CAST(sum(n_tok) AS DOUBLE)) AS rate
            FROM d JOIN (VALUES {vals}) t(lang, w) USING (lang)
            GROUP BY d.lang, t.w
        ), s AS (
            SELECT d.lang, d.n_tok, r.group_tokens, r.rate FROM d
            JOIN r USING (lang)
            WHERE {HASH_SQL.format(x="CAST(doc_id AS VARCHAR)")} % 1000000
                  < CAST(floor(rate * 1000000) AS BIGINT)
        )
        SELECT lang, count(*) AS n_kept, CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
               any_value(group_tokens) AS group_tokens,
               {PR('any_value(rate)', 6)} AS rate
        FROM s GROUP BY lang
    """


@ext_query(
    "q_l18_mixture_sample",
    oracle=_mixture_oracle(),
    doc="Target-mixture corpus sampling (DoReMi-style static domain "
    "weights): per-stratum rates = min(1, w*budget/group_tokens), applied "
    "as the deterministic md5-bucket predicate. Agg -> broadcast join -> "
    "filter; no driver collect, replay-stable.",
)
def q_l18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.sampling import (
        mixture_rates,
        mixture_sample,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("n_tok", F.size(TX.words(F.col("text"))).cast("long"))
        .withColumn("k", F.col("doc_id").cast("string"))
    )
    kept = mixture_sample(
        docs,
        targets=_MIX_TARGETS,
        budget_tokens=_MIX_BUDGET,
        strata_col="lang",
        token_col="n_tok",
        key_cols=["k"],
    )
    rates = mixture_rates(docs, _MIX_TARGETS, _MIX_BUDGET, "lang", "n_tok")
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tok").cast("long").alias("kept_tokens"),
        )
        .join(
            rates.select(
                "lang", "group_tokens", pround("rate", 6).alias("rate")
            ),
            "lang",
        )
    )


def _budget_select_oracle() -> str:
    # arithmetic shape mirrors functions/text.py::quality_score exactly
    # (ratio first, then x5 — grouping matters for bit-identical doubles);
    # portable rounding so the quality ORDER (which drives selection) is
    # engine-identical, not just display-rounded
    quality = PR(
        "0.4 * least(len(w) / 200.0, 1.0)"
        " + 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text,"
        " '[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE) / length(text))"
        " + 0.3 * least(5.0 * (CAST(len(list_filter(w,"
        f" x -> list_contains({_STOPWORDS_SQL}, x)))"
        " AS DOUBLE) / len(w)), 1.0)",
        6,
    )
    return f"""
        WITH d AS (
            SELECT doc_id, lang, CAST(len(w) AS BIGINT) AS n_tok,
                   {quality} AS quality
            FROM (SELECT doc_id, lang, text, {WORDS_SQL} AS w FROM documents)
        ), c AS (
            SELECT *, sum(n_tok) OVER (
                PARTITION BY lang ORDER BY quality DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM d
        )
        SELECT lang, count(*) AS n_kept, CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
               {PR('min(quality)', 6)} AS min_quality
        FROM c WHERE cum <= 5000 GROUP BY lang
    """


@ext_query(
    "q_l19_budget_select",
    oracle=_budget_select_oracle(),
    doc="Quality-ranked token-budget curation: per-language, keep the "
    "highest-quality docs until a 5k-token budget (greedy prefix on the "
    "quality-desc order, deterministic tie-break). One window per "
    "partition key — the per-domain-budget formulation that scales.",
)
def q_l19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.sampling import select_to_budget

    # words staged once (r12): n_tok + quality_score referenced the
    # tokenize chain 4x per row — see functions/text.py's *_from note
    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("__w", TX.words(F.col("text")))
        .withColumn("n_tok", F.size(F.col("__w")).cast("long"))
        .withColumn(
            "quality",
            pround(TX.quality_score_from(F.col("text"), F.col("__w")), 6),
        )
        .drop("__w")
    )
    kept = select_to_budget(
        docs, 5000, token_col="n_tok", rank_col="quality", partition_col="lang"
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tok").cast("long").alias("kept_tokens"),
        pround(F.min("quality"), 6).alias("min_quality"),
    )


def _grams_n_sql(n: int) -> str:
    """DuckDB word-n-gram list over a words array ``w`` (parametric n)."""
    terms = ", ' ', ".join(f"w[i+{j}]" for j in range(n))
    return f"list_transform(range(1, len(w)-{n - 2}), i -> concat({terms}))"


@ext_query(
    "q_l20_paragraph_dedup",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, {WORDS_SQL} AS w FROM documents WHERE doc_id <= 300
        ), para AS (
            SELECT doc_id,
                   array_to_string(
                       list_transform(range(0, CAST(ceil(len(w)/8.0) AS INT)),
                           i -> array_to_string(w[i*8+1:i*8+8], ' ')),
                       chr(10)) AS text
            FROM base
        ), e0 AS (
            SELECT doc_id, ls, unnest(range(1, len(ls)+1)) AS pos
            FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM para)
        ), ln AS (
            SELECT doc_id, pos, ls[pos] AS line
            FROM e0 WHERE trim(ls[pos]) <> ''
        ), r AS (
            SELECT doc_id, pos, line,
                   row_number() OVER (PARTITION BY md5(translate(trim(line), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'))
                                      ORDER BY doc_id, pos) = 1 AS keep
            FROM ln
        )
        SELECT doc_id,
               count(*) AS n_lines,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               md5(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos))
                   AS text_md5
        FROM r GROUP BY doc_id
    """,
    doc="Line/paragraph-level global exact dedup (C4/RefinedWeb curation "
    "step): derive a paragraph-structured corpus (newline every 8 words — "
    "the synthetic docs ship as single lines), keep each normalized line's "
    "globally FIRST occurrence, reassemble surviving documents. Full value "
    "parity: per-doc line counts plus md5 of the reassembled text.",
)
def q_l20(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 300)
    w = TX.words(F.col("text"))
    paras = F.transform(
        F.sequence(
            F.lit(0), (F.ceil(F.size(w) / F.lit(8.0))).cast("int") - 1
        ),
        lambda i: F.concat_ws(" ", F.slice(w, i * 8 + 1, 8)),
    )
    structured = docs.select(
        "doc_id", F.concat_ws("\n", paras).alias("text")
    )
    out = DD.paragraph_dedup(structured, text_col="text", id_col="doc_id")
    return out.select(
        "doc_id", "n_lines", "n_kept", F.md5(F.col("text")).alias("text_md5")
    )


@ext_query(
    "q_l21_decontaminate",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, {WORDS_SQL} AS w FROM documents
        ), g AS (
            SELECT doc_id, list_distinct({_grams_n_sql(5)}) AS grams
            FROM w WHERE len(w) >= 5
        ), ex AS (
            SELECT doc_id, unnest(grams) AS gram FROM g
        ), hg AS (
            SELECT DISTINCT md5(gram) AS gh FROM ex WHERE doc_id % 10 = 0
        ), tg AS (
            SELECT doc_id, md5(gram) AS gh FROM ex WHERE doc_id % 10 <> 0
        )
        SELECT doc_id, count(*) AS n_hit_grams
        FROM tg JOIN hg USING (gh)
        GROUP BY doc_id
    """,
    doc="Benchmark decontamination (GPT-3 appendix C style): every tenth "
    "document plays the held-out eval set; training docs sharing any word "
    "5-gram with it are flagged with their hit count. Holdout gram set is "
    "broadcast-joined against the exploded training grams at scale.",
)
def q_l21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.contamination import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    holdout = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return decontaminate(train, holdout, n=5)


@ext_query(
    "q_l27_bloom_decontaminate",
    # the ORACLE IS THE EXACT PATH (q_l21's SQL verbatim): Bloom false
    # negatives are impossible and the exact-join verification removes
    # every false positive, so the sketch path must match the exact join
    # row-for-row — the strongest possible check for an approximate
    # prefilter
    oracle=f"""
        WITH w AS (
            SELECT doc_id, {WORDS_SQL} AS w FROM documents
        ), g AS (
            SELECT doc_id, list_distinct({_grams_n_sql(5)}) AS grams
            FROM w WHERE len(w) >= 5
        ), ex AS (
            SELECT doc_id, unnest(grams) AS gram FROM g
        ), hg AS (
            SELECT DISTINCT md5(gram) AS gh FROM ex WHERE doc_id % 10 = 0
        ), tg AS (
            SELECT doc_id, md5(gram) AS gh FROM ex WHERE doc_id % 10 <> 0
        )
        SELECT doc_id, count(*) AS n_hit_grams
        FROM tg JOIN hg USING (gh)
        GROUP BY doc_id
    """,
    doc="Bloom-prefiltered decontamination — the 100 TB shape of q_l21: "
    "the training corpus scan stays MAP-ONLY (every gram tested against "
    "a bitmap literal inside codegen, no exchange, no Python) and only "
    "the ~fp-rate survivors shuffle into the exact verification join. "
    "Result is row-identical to the exact path by construction.",
)
def q_l27(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.contamination import (
        decontaminate_bloom,
    )

    docs = load_table(spark, sf_dir, "documents")
    holdout = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return decontaminate_bloom(train, holdout, n=5)


@ext_query(
    "q_l22_lm_surprisal",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({WORDS_SQL}) AS tok FROM documents
        ), freq AS (
            SELECT tok, count(*) AS c FROM toks GROUP BY tok
        ), tot AS (
            SELECT CAST(sum(c) AS BIGINT) AS n FROM freq
        )
        SELECT doc_id, count(*) AS n_tok,
               CAST(sum(CAST(floor(1000 * log2(CAST(n AS DOUBLE) / c) + 0.5)
                             AS BIGINT)) AS BIGINT) AS surprisal_mb
        FROM toks JOIN freq USING (tok) CROSS JOIN tot
        GROUP BY doc_id
    """,
    doc="Corpus-unigram-LM document surprisal (CCNet-flavored quality "
    "signal): per-token surprisal quantized to integer millibits BEFORE "
    "summation so document sums are exact, order-independent, and "
    "bit-identical to the DuckDB oracle.",
)
def q_l22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.lm import doc_surprisal_millibits

    docs = load_table(spark, sf_dir, "documents")
    return doc_surprisal_millibits(docs)


def _pii_oracle() -> str:
    from go_pq_cdc_elasticsearch_spark.operators.redact import PII_PATTERNS

    counts = ",\n               ".join(
        f"CAST(len(regexp_extract_all(t, '{rx}')) AS BIGINT) AS n_{kind}"
        for kind, rx, _ in PII_PATTERNS
    )
    clean = "t"
    for _, rx, token in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{rx}', '{token}', 'g')"
    return f"""
        WITH p AS (
            SELECT doc_id,
                   text || ' reach user' || doc_id
                        || '@example.com via 192.168.' || (doc_id % 250)
                        || '.1 or +44 207 946 0'
                        || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                        || ' ref 9'
                        || lpad(CAST(doc_id % 100000 AS VARCHAR), 8, '0') AS t
            FROM documents
        )
        SELECT doc_id,
               {counts},
               md5({clean}) AS clean_md5
        FROM p
    """


@ext_query(
    "q_l23_pii_redact",
    oracle=_pii_oracle(),
    doc="PII redaction hygiene pass: deterministic email/IPv4/phone/digit-run "
    "PII is synthesized from doc_id (the synthetic corpus ships clean), then "
    "counted and redacted with the engine-portable pattern table in "
    "operators/redact.py. Map-only — zero shuffles; value parity includes "
    "the md5 of the fully redacted text.",
)
def q_l23(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.redact import redact

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    pii = F.concat(
        F.col("text"),
        F.lit(" reach user"), d.cast("string"),
        F.lit("@example.com via 192.168."), (d % 250).cast("string"),
        F.lit(".1 or +44 207 946 0"),
        F.lpad((d % 1000).cast("string"), 3, "0"),
        F.lit(" ref 9"),
        F.lpad((d % 100000).cast("string"), 8, "0"),
    )
    out = redact(docs.select("doc_id", pii.alias("text")))
    return out.select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "n_digits",
        F.md5(F.col("clean_text")).alias("clean_md5"),
    )


BM25_TERMS = ["table", "merge", "vector"]


@ext_query(
    "q_l24_bm25",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({WORDS_SQL}) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        ), dl AS (
            SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
        ), corpus AS (
            SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl
        ), hits AS (
            SELECT * FROM tf
            WHERE term IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})
        ), dfreq AS (
            SELECT term, count(*) AS df_t FROM hits GROUP BY term
        ), scored AS (
            SELECT h.doc_id,
                   ln(1 + (c.n_docs - f.df_t + 0.5) / (f.df_t + 0.5))
                   * (h.tf * (1.2 + 1.0))
                   / (h.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl)) AS s
            FROM hits h
            JOIN dfreq f USING (term)
            JOIN dl d USING (doc_id)
            CROSS JOIN corpus c
        )
        SELECT doc_id, {PR('sum(s)', 6)} AS score
        FROM scored GROUP BY doc_id
        ORDER BY {PR('sum(s)', 6)} DESC, doc_id
        LIMIT 20
    """,
    doc="BM25 ranked retrieval (the Lucene/Elasticsearch default scoring "
    "function) computed as corpus-statistics DataFrames: the reference's "
    "'ship to ES, search there' loop closed Spark-side. Deterministic "
    "(pround(score,6) DESC, doc_id) ordering for engine-portable top-k.",
)
def q_l24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.ranking import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=20)


@ext_query(
    "q_l25_chunking",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, {WORDS_SQL} AS w, len({WORDS_SQL}) AS n
            FROM documents WHERE doc_id <= 300
        ), c AS (
            SELECT doc_id, w, n,
                   CASE WHEN n <= 24 THEN 1
                        ELSE CAST(ceil((n - 24) / 16.0) AS INT) + 1 END AS n_chunks
            FROM w
        ), e AS (
            SELECT doc_id, w, n,
                   unnest(range(0, n_chunks)) AS chunk_idx
            FROM c
        )
        SELECT doc_id, chunk_idx,
               CAST(least(24, n - chunk_idx * 16) AS BIGINT) AS n_tok_chunk,
               md5(array_to_string(w[chunk_idx*16 + 1 : chunk_idx*16 + 24], ' '))
                   AS chunk_md5
        FROM e
    """,
    doc="Sliding-window token chunking (RAG prep): 24-token chunks, 8-token "
    "overlap (stride 16), tail chunk shorter; map-only, no shuffle. Value "
    "parity includes the md5 of every chunk's text.",
)
def q_l25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_elasticsearch_spark.operators.lm import chunk_documents

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 300)
    out = chunk_documents(docs, chunk_tokens=24, overlap=8)
    return out.select(
        "doc_id", "chunk_idx", "n_tok_chunk",
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )


# q_l7's oracle composes the simhash, text-features and langid oracles by a
# doc_id join (set after definition so the fragments above are available).
from go_pq_cdc_elasticsearch_spark.sql.registry import EXT_REGISTRY as _EXT  # noqa: E402

# ROW-LEVEL compose, not a 3-way doc_id self-join: the Spark side is one
# per-row select, and the join form fanned out multiplicatively on a
# duplicated doc_id (2x2x2 rows for one dup — dup_rel variant). Every
# fragment is a per-row expression over (text, w), so the compose can be
# a single pass that preserves input-row multiplicity exactly.
_EXT["q_l7_simhash"].oracle = f"""
    SELECT doc_id,
           {_simhash_expr_sql()} AS simhash,
           CAST(len({WORDS_SQL}) AS BIGINT) AS tok_ws,
           CAST(len(regexp_extract_all(text, '{TX.BPE_TOKEN_RE}')) AS BIGINT) AS tok_bpe,
           {_L8_STOP_PR} AS stop_ratio,
           {_L8_PUNCT_PR} AS punct_r,
           {_L8_QUAL_PR} AS quality,
           substr(md5({NORM_SQL}), 1, 16) AS fp,
           {_langid_expr_sql()} AS lang_pred
    FROM (SELECT doc_id, text, {WORDS_SQL} AS w
          FROM documents WHERE doc_id <= 200)
"""


def _dedup_corpus_oracle(k: int = 16, bands: int = 8, tau: float = 0.7) -> str:
    rows = k // bands
    sig_entries = ",\n            ".join(
        _minhash_family_sql(j) for j in range(k)
    )
    band_cols = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows))
        + f")) AS band_{b}"
        for b in range(bands)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band_{b} AS band_hash FROM banded"
        for b in range(bands)
    )
    return f"""
        WITH RECURSIVE base AS (
            SELECT doc_id, {WORDS_SQL} AS w FROM documents
        ), g AS (
            SELECT doc_id, {GRAMS_SQL} AS grams FROM base WHERE len(w) >= 3
        ), gd AS (
            SELECT doc_id, list_distinct(grams) AS grams FROM g
        ), sig_t AS (
            SELECT doc_id, [{sig_entries}] AS sig FROM g
        ), banded AS (
            SELECT doc_id, {band_cols} FROM sig_t
        ), bands AS ({band_union}),
        cand AS (
            SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id
        ),
        verified AS (
            SELECT id1, id2 FROM cand
            JOIN gd ga ON ga.doc_id = id1
            JOIN gd gb ON gb.doc_id = id2
            WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                  / len(list_distinct(ga.grams || gb.grams)) >= {tau}
        ),
        edges AS (
            SELECT id1 AS a, id2 AS b FROM verified
            UNION SELECT id2, id1 FROM verified
        ),
        reach(id, comp) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id
        ),
        comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
        dropped_rows AS (
            -- ROWS, not ids: the engine removes every row of a dropped
            -- doc_id, so a duplicated dropped doc counts twice on both
            -- sides (dup_rel variant; identical on unique-key data)
            SELECT count(*) AS n FROM documents d
            JOIN comp c ON c.id = d.doc_id AND c.id <> c.component
        )
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT n FROM dropped_rows) AS n_dropped,
               (SELECT count(*) FROM documents) -
               (SELECT n FROM dropped_rows) AS n_after
    """


@query(
    "q_l11_dedup_corpus",
    oracle=_dedup_corpus_oracle(),
    doc="End-to-end corpus near-dup removal: MinHash/LSH candidates -> "
    "exact Jaccard >= 0.7 -> connected components (distributed min-label "
    "propagation) -> keep min-id representative. Oracle reproduces the "
    "identical pipeline in SQL incl. a recursive-CTE closure.",
)
def q_l11(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    deduped = DD.dedup_corpus(docs, jaccard_threshold=0.7)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    n_after_df = deduped.agg(F.count(F.lit(1)).alias("n_after"))
    return n_docs.crossJoin(n_after_df).select(
        "n_docs",
        (F.col("n_docs") - F.col("n_after")).alias("n_dropped"),
        "n_after",
    )


def _bmp_decode_oracle(side: int = 4, bmp_bytes: int = 102) -> str:
    """DuckDB SQL recomputing q_lx2's decoded-image channel means directly
    from the md5 pixel construction (operators/multimodal.py::
    synthetic_bmp_media): raw pixel bytes are the concatenation of
    md5(text ∥ 0x0000), md5(text ∥ 0x0001), md5(text ∥ 0x0002) — 48 bytes
    reshaped (4,4,3). chr(0)/chr(1)/chr(2) hash the identical bytes in
    DuckDB, so the oracle derives every byte from the hex digest and
    aggregates the same channel means the Spark side reads back out of
    the REAL encode->decode round trip. n_bytes is the fixed 4x4 24-bit
    BMP file size (54-byte header + 48 pixel bytes, stride already
    4-aligned)."""
    n_px = side * side * 3

    def byte(j: int) -> str:
        return (
            f"CAST(concat('0x', substr(h{j // 16}, {2 * (j % 16) + 1}, 2)) AS INT)"
        )

    def chan(c: int) -> str:
        return "(" + " + ".join(byte(j) for j in range(c, n_px, 3)) + ") / 16.0"

    all_bytes = ", ".join(byte(j) for j in range(n_px))
    return f"""
        WITH d AS (
            SELECT doc_id, source,
                   md5(text || chr(0) || chr(0)) AS h0,
                   md5(text || chr(0) || chr(1)) AS h1,
                   md5(text || chr(0) || chr(2)) AS h2
            FROM documents WHERE doc_id <= 200
        ), px AS (
            SELECT doc_id, source,
                   {chan(0)} AS mean_r, {chan(1)} AS mean_g, {chan(2)} AS mean_b,
                   least({all_bytes}) AS px_min_d,
                   greatest({all_bytes}) AS px_max_d
            FROM d
        )
        SELECT source, count(*) AS n_media,
               count(*) * {bmp_bytes} AS total_bytes,
               {PR('sum(mean_r) / count(*)', 6)} AS avg_r,
               {PR('sum(mean_g) / count(*)', 6)} AS avg_g,
               {PR('sum(mean_b) / count(*)', 6)} AS avg_b,
               CAST(min(px_min_d) AS BIGINT) AS px_min,
               CAST(max(px_max_d) AS BIGINT) AS px_max
        FROM px GROUP BY source
    """


@ext_query(
    "q_lx2_multimodal_decode",
    oracle=_bmp_decode_oracle(),
)
def q_lx2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode path end-to-end, value-checked: documents ->
    deterministic valid BMP blobs (synthetic_bmp_media, pixels md5-derived
    from the text) -> genuine header+pixel decode (codecs.decode_bmp,
    decode_stub=False) -> per-source channel-mean stats. The oracle
    recomputes the identical pixel bytes directly from md5 in SQL (the
    construction is md5(text ∥ counter) — chr(0)/chr(1) suffixes hash the
    same bytes in both engines), so a corruption anywhere in the
    build->encode->decode->feature chain breaks the hash. Channel means
    are sums of exact small integers / 16 (dyadic, order-independent) and
    the per-source average is an explicit exact-sum / count — bit-portable
    without any decimal detour. Byte-exact codec round-trips remain
    unit-tested in tests/test_codecs.py."""
    from go_pq_cdc_elasticsearch_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    media = MM.synthetic_bmp_media(docs)
    feats = MM.extract_features(media, decode_stub=False)
    # the join-back dimension MUST be unique per media_id: a duplicated
    # doc row otherwise fans the join quadratically (2 feats rows x 2 src
    # rows = 4) and every per-source stat silently double-counts — found
    # by the dup_rel variant. Exact duplicates make pick-any well-defined.
    src = docs.select(
        F.col("doc_id").alias("media_id"), "source"
    ).dropDuplicates(["media_id"])
    f = F.col("features")
    return (
        feats.join(src, on="media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            pround(F.sum(f.getItem(2)) / F.count(F.lit(1)), 6).alias("avg_r"),
            pround(F.sum(f.getItem(3)) / F.count(F.lit(1)), 6).alias("avg_g"),
            pround(F.sum(f.getItem(4)) / F.count(F.lit(1)), 6).alias("avg_b"),
            F.min(f.getItem(6)).cast("long").alias("px_min"),
            F.max(f.getItem(7)).cast("long").alias("px_max"),
        )
        .orderBy("source")
    )


@ext_query(
    "q_lx1_ann_ivf",
    # BOUNDED claim (q_s10_approx_distinct pattern, VERDICT r4 item 4):
    # the exact brute-force top-k is the hash-checked twin, and the
    # declared approximate config's recall against it is emitted as a
    # boolean the oracle's TRUE must match — no longer rows-only.
    oracle=f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id < 20),
        scored AS (
            SELECT q.qid, e.vec_id,
                   {COS_SQL.format(a="q.qe", b="e.embedding")} AS sim
            FROM q JOIN embeddings e ON e.vec_id <> q.qid
        )
        SELECT qid, vec_id, {PSIM6} AS sim, rank,
               TRUE AS recall_ge_floor
        FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
            FROM scored)
        WHERE rank <= 5
    """,
)
def q_lx1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via IVF-Flat (coarse k-means cells + n_probe search) — the
    data-adaptive 100 TB path alongside q_l10's LSH. Oracle-checked as a
    BOUNDED claim: the rows are the exact brute-force top-k (which DuckDB
    recomputes from scratch), plus a boolean asserting the declared
    approximate config (n_probe=3 of 8 cells) recalled >= 1/4 of them —
    floor = measured-minus-margin on near-orthogonal RANDOM testdata
    (means 0.58-0.76 across sf0.001-0.1 over 20 queries; a clustered
    real-world corpus would sit far higher), integer-exact as n_hit*4 >=
    n_total so no float division crosses engines. At 100 TB only the IVF
    side runs (that's its point); the exact twin is the test-scale
    verifier. Exactness anchor q_lx1b and the sf0.1 recall-drift floors
    (tests/test_llm.py) still stand."""
    from go_pq_cdc_elasticsearch_spark.operators.dedup import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    # BLAS selects candidates (4x margin), the final 5 are RE-RANKED with
    # the declarative fold cosine — bit-identical to the oracle's list_sum,
    # so near-tied candidates can't swap rank on BLAS-vs-fold summation
    # noise (the q_l3 rule; emitting brute_force_topk's BLAS ranks
    # directly was the one top-k in the file violating it — review r5)
    def _exact():
        cand = SIM.brute_force_topk(emb, queries_df, k=20).select(
            "qid", "vec_id"
        )
        c = emb.select("vec_id", F.col("embedding").alias("__cv"))
        qv = queries_df.select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("__qv")
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("sim").desc(), F.col("vec_id")
        )
        return (
            cand.join(c, "vec_id")
            .join(F.broadcast(qv), "qid")
            .withColumn("sim", cosine(F.col("__qv"), F.col("__cv")))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("qid", "vec_id", "sim", "rank")
            # pinned: three consumers below (semi-join, count, output)
            # would otherwise each re-run the BLAS corpus pass
            .localCheckpoint(eager=True)
        )

    def _approx():
        return SIM.ivf_topk(emb, queries_df, k=5, n_centroids=8, n_probe=3)

    # The exact twin's materialization (BLAS corpus pass + re-rank join +
    # eager checkpoint) and the IVF build's driver-synchronous jobs
    # (TakeOrdered training sample, query collect) are INDEPENDENT serial
    # chains — running them sequentially stacked ~10 driver round trips
    # end to end. Two threads submit them concurrently and the scheduler
    # interleaves (the q_lx4 two-leg pattern, optimization guide §2.6);
    # both legs are deterministic functions of the same inputs, so the
    # result is unchanged.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_exact = pool.submit(_exact)
        f_approx = pool.submit(_approx)
        exact = f_exact.result()
        approx = f_approx.result()
    n_hit = exact.join(
        approx.select("qid", "vec_id"), ["qid", "vec_id"], "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_hit"))
    n_tot = exact.agg(F.count(F.lit(1)).alias("n_tot"))
    claim = n_hit.crossJoin(n_tot).select(
        (F.col("n_hit") * 4 >= F.col("n_tot")).alias("recall_ge_floor")
    )
    return exact.select(
        "qid", "vec_id", pround("sim", 6).alias("sim"), "rank"
    ).crossJoin(claim)


@ext_query(
    "q_lx4_semantic_dedup",
    # BOUNDED claim (q_s10_approx_distinct pattern, VERDICT r4 item 4):
    # plant exact-direction duplicates on a bounded slice, let DuckDB
    # recompute the exact all-pairs closure's drop count from scratch, and
    # emit the cluster-approximate config's planted recall + soundness as
    # booleans the oracle's TRUEs must match — no longer rows-only.
    oracle=f"""
        WITH RECURSIVE base AS (
            SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500),
        planted AS (
            SELECT vec_id, list_transform(embedding,
                       x -> CAST(x AS DOUBLE)) AS embedding FROM base
            UNION ALL
            SELECT vec_id + 1000000, list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * 1.0001)
            FROM base WHERE vec_id < 40),
        pairs AS (
            SELECT a.vec_id AS id1, b.vec_id AS id2
            FROM planted a JOIN planted b ON b.vec_id > a.vec_id
            WHERE {COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.99
        ),
        edges AS (
            SELECT id1 AS a, id2 AS b FROM pairs
            UNION SELECT id2, id1 FROM pairs
        ),
        reach(id, comp) AS (
            SELECT a, a FROM edges
            UNION
            SELECT ed.a, r.comp FROM edges ed JOIN reach r ON ed.b = r.id
        ),
        comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
        SELECT (SELECT count(*) FROM planted) AS n_vecs,
               (SELECT count(*) FROM comp WHERE id <> component) AS n_dropped_exact,
               TRUE AS recall_ge_floor,
               TRUE AS approx_subset_of_exact
    """,
)
def q_lx4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style embedding near-dup removal: k-means cells -> within-
    cell cosine >= tau pairs -> connected components -> keep min-id rep.
    Oracle-checked as a BOUNDED claim on a planted corpus (a <=540-vector
    slice so the oracle's all-pairs recursive-CTE closure stays cheap at
    every sf): scaled copies (cosine == 1, cell argmax is scale-invariant)
    are unioned in, the EXACT drop count (n_centroids=1 == all-pairs) is
    the hash-checked twin DuckDB recomputes from scratch, and two booleans
    assert (a) the cluster-approximate config re-found >= 9/10 of the
    exact drops (integer-exact as n_hit*10 >= n_exact*9) and (b) it
    dropped nothing the exact closure kept (approx edges are a subset of
    exact edges, so a violation can only be a machinery bug). At 100 TB
    only the clustered config runs; the exact twin is the test-scale
    verifier. Anchor q_lx4b and the sf0.1 planted-recall drift test
    (tests/test_llm.py) still stand."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 500).select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") < 40).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.0001)).alias(
            "embedding"
        ),
    )
    # pin the tiny planted slice (<=540 rows) once: both dedup legs and
    # the ids anti-joins otherwise re-run the parquet scan + filter +
    # union per evaluation (~5 evaluations across the two legs)
    planted = base.unionByName(dups).localCheckpoint(eager=True)
    ids = planted.select("vec_id")

    # The two semantic_dedup legs are INDEPENDENT serial pipelines of
    # fixed machinery (train/assign, pair join, eager CC rounds, eager
    # checkpoint — ~20 small driver-synchronous jobs each), so running
    # them sequentially doubled the wall for no reason; two threads
    # submit their jobs concurrently and the scheduler interleaves them
    # (this query was the slowest declared query by 3x and ~25% of the
    # whole bench wall — review r9 perf). Each leg is pinned with an
    # eager localCheckpoint because the dropped set feeds multiple
    # counts/joins below and its lineage would re-execute per consumer.
    def _dropped_for(n_centroids: int):
        kept = SIM.semantic_dedup(planted, tau=0.99, n_centroids=n_centroids)
        return ids.join(
            kept.select("vec_id"), "vec_id", "left_anti"
        ).localCheckpoint(eager=True)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_exact = pool.submit(_dropped_for, 1)
        f_approx = pool.submit(_dropped_for, 8)
        dropped_exact = f_exact.result()
        dropped_approx = f_approx.result()
    n_vecs = ids.agg(F.count(F.lit(1)).alias("n_vecs"))
    n_exact = dropped_exact.agg(F.count(F.lit(1)).alias("n_dropped_exact"))
    n_hit = dropped_approx.join(dropped_exact, "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    n_stray = dropped_approx.join(dropped_exact, "vec_id", "left_anti").agg(
        F.count(F.lit(1)).alias("n_stray")
    )
    return (
        n_vecs.crossJoin(n_exact)
        .crossJoin(n_hit)
        .crossJoin(n_stray)
        .select(
            "n_vecs",
            "n_dropped_exact",
            (F.col("n_hit") * 10 >= F.col("n_dropped_exact") * 9).alias(
                "recall_ge_floor"
            ),
            (F.col("n_stray") == 0).alias("approx_subset_of_exact"),
        )
    )


@ext_query(
    "q_l26_token_heavy_hitters",
    oracle=f"""
        WITH toks AS (
            SELECT unnest({WORDS_SQL}) AS token FROM documents),
        tot AS (SELECT count(*) AS n FROM toks WHERE token IS NOT NULL)
        SELECT token, cnt FROM (
            SELECT token, count(*) AS cnt FROM toks
            WHERE token IS NOT NULL GROUP BY token) counted, tot
        WHERE cnt * 200 >= n
    """,
)
def q_l26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token heavy hitters (frequency >= 1/200 of the corpus token stream)
    via sketch-pruned exact counting: freqItems candidates (superset
    guarantee) + broadcast exact verify (operators/frequent.py). The
    boilerplate-frequency curation step; output is exact, so the oracle is
    a from-scratch GROUP BY with the identical integer threshold."""
    from go_pq_cdc_elasticsearch_spark.operators.frequent import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TX.words(F.col("text"))).alias("token"))
    return heavy_hitters(toks, "token", support_num=1, support_den=200)


@ext_query(
    "q_lx1b_ivf_anchor",
    oracle=f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id >= 5 AND vec_id < 10),
        scored AS (
            SELECT q.qid, e.vec_id,
                   {COS_SQL.format(a="q.qe", b="e.embedding")} AS sim
            FROM q JOIN embeddings e ON e.vec_id <> q.qid
        )
        SELECT qid, vec_id, {PSIM6} AS sim, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
            FROM scored)
        WHERE rank <= 5
    """,
)
def q_lx1b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat correctness ANCHOR, oracle-checked: at n_probe ==
    n_centroids every cell is probed, so the candidate set is the whole
    corpus and the result must EQUAL brute-force cosine top-k regardless
    of how the k-means training clustered — which is SQL-expressible. The
    approximate configuration stays in q_lx1 (recall-tested); this row
    pins the machinery (training, cell assignment, probe join, re-rank)
    to a from-scratch oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))
    out = SIM.ivf_topk(emb, queries_df, k=5, n_centroids=4, n_probe=4)
    return out.select("qid", "vec_id", pround("sim", 6).alias("sim"), "rank")


@ext_query(
    "q_lx4b_semdedup_anchor",
    oracle=f"""
        WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
        pairs AS (
            SELECT a.vec_id AS id1, b.vec_id AS id2
            FROM e a JOIN e b ON b.vec_id > a.vec_id
            WHERE {COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.99
        ),
        edges AS (
            SELECT id1 AS a, id2 AS b FROM pairs
            UNION SELECT id2, id1 FROM pairs
        ),
        reach(id, comp) AS (
            SELECT a, a FROM edges
            UNION
            SELECT ed.a, r.comp FROM edges ed JOIN reach r ON ed.b = r.id
        ),
        comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
        SELECT vec_id FROM e
        WHERE vec_id NOT IN (SELECT id FROM comp WHERE id <> component)
    """,
)
def q_lx4b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup correctness ANCHOR, oracle-checked: at n_centroids=1 the
    cell join degenerates to exact all-pairs dedup, whose kept-id set a
    recursive-CTE closure recomputes from scratch (same shape as q_l11's
    oracle). The cluster-approximate configuration stays in q_lx4; this
    row pins the pair-threshold, connected-components and min-id-
    representative machinery cell-exactly. The threshold compare is safe:
    Spark's declarative cosine is the same left-fold formulation as the
    oracle's list_sum."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    kept = SIM.semantic_dedup(emb, tau=0.99, n_centroids=1)
    return kept.select("vec_id")


def _quantized_topk_oracle(k: int = 5) -> str:
    """DuckDB SQL recomputing the IDENTICAL SQ8 pipeline as
    ``quantize_embeddings`` + ``quantized_topk``: the int8 codes come from
    ``floor(x/scale + 0.5)`` where every step is an order-independent exact
    IEEE-754 double op (abs, max, two divisions, +0.5, floor), so the codes
    are bit-identical across engines; the corpus-side norm is a sum of
    exact small integers (order-independent too). Only the final dot
    product against the full-precision query vector carries summation-order
    float noise — the same ~1e-16 relative noise the q_l3/q_l10 cosine
    oracles already absorb under round(6)."""
    return f"""
        WITH scaled AS (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
            FROM embeddings
            -- defective vectors (NULL/NaN/Inf elements, empty) have no
            -- similarity and never rank — same contract as COS_SQL; the
            -- bare form quantized NaN to NaN codes whose NaN sims DuckDB
            -- ranks ABOVE every real score (nulls_rel variant, review r8)
            WHERE embedding IS NOT NULL AND len(embedding) > 0
              AND len(list_filter(embedding, v -> v IS NULL
                      OR isnan(CAST(v AS DOUBLE))
                      OR isinf(CAST(v AS DOUBLE)))) = 0),
        quant AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       floor(CAST(x AS DOUBLE) /
                             (CASE WHEN s = 0 THEN 1.0 ELSE s END) + 0.5)) AS qv
            FROM scaled),
        queries AS (
            SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 5),
        scored AS (
            SELECT q.qid, c.vec_id,
                   list_sum(list_transform(list_zip(c.qv, q.embedding),
                       p -> p[1] * CAST(p[2] AS DOUBLE)))
                   / ((CASE WHEN list_sum(list_transform(c.qv, v -> v*v)) = 0
                            THEN 1.0
                            ELSE sqrt(list_sum(list_transform(c.qv, v -> v*v)))
                       END)
                      * sqrt(list_sum(list_transform(q.embedding,
                            v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))) AS sim
            FROM quant c CROSS JOIN queries q
            WHERE c.vec_id <> q.qid)
        SELECT qid, vec_id, {PSIM6} AS sim, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
            FROM scored)
        WHERE rank <= {k}
    """


@ext_query(
    "q_lx3_quantized_topk",
    oracle=_quantized_topk_oracle(),
)
def q_lx3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k computed directly on the int8-quantized corpus (4x
    memory/shuffle reduction at rest — the SQ8 scale path). The DuckDB
    oracle recomputes the identical quantization (bit-reproducible
    floor-half-up codes) and scores, so selection, scores and ranks are all
    value-checked; reconstruction-error bound and recall vs brute force
    are additionally asserted in tests/test_llm.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    # lazy localCheckpoint: the quantization is an interpreted-HOF
    # projection (transform/exists lambdas run in Spark's interpreted
    # evaluator) referenced by BOTH the candidate scorer and the exact
    # re-rank below — unpinned, each subtree re-evaluated it over the
    # full corpus (stage probe: ~3 s + ~2 s at sf0.1, the query's
    # dominant cost). The checkpoint materializes it ONCE in the first
    # action (guide §5: cut lineage / reuse instead of recompute);
    # eager=False so no extra job is paid. Deterministic projection —
    # rows identical either way (oracle-pinned).
    qcorpus = SIM.quantize_embeddings(emb).localCheckpoint(eager=False)
    # numpy selects top-4k; the final 5 are re-ranked with the oracle's
    # exact fold (incl. its zero-norm guard) so near-ties cannot swap on
    # BLAS-vs-fold noise — same rationale as q_l3
    cand = SIM.quantized_topk(qcorpus, queries_df, k=20).select("qid", "vec_id")
    c = qcorpus.select("vec_id", F.col("qvec").alias("__qv_c"))
    q = queries_df.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("__qe")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("__qv_c"),
            F.col("__qe"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nc_sq = F.aggregate(
        F.transform(F.col("__qv_c"), lambda v: v.cast("double") * v.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nq_sq = F.aggregate(
        F.transform(F.col("__qe"), lambda v: v.cast("double") * v.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nq = F.sqrt(nq_sq)
    nc = F.when(nc_sq == 0, F.lit(1.0)).otherwise(F.sqrt(nc_sq))
    scored = (
        cand.join(c, "vec_id")
        .join(F.broadcast(q), "qid")
        # nq guarded like every other cosine in the repo: an all-zero
        # QUERY vector makes the divisor 0 — ANSI raises DIVIDE_BY_ZERO
        # while the oracle's x/0 yields NULL; NULL keeps parity (both
        # engines sort NULL sims last under DESC) — review r5
        .withColumn("sim", F.when(nq_sq != 0, dot / (nc * nq)))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "vec_id", pround("sim", 6).alias("sim"), "rank")
    )


def _lsh_oracle(n_planes: int = 8, k: int = 5) -> str:
    """DuckDB SQL computing the IDENTICAL ANN result as ``lsh_topk``: the
    hyperplane entries are ±1 from md5(plane, dim) (operators/similarity.py
    ``with_lsh_bucket``), so the oracle reproduces the exact signatures,
    multi-probe buckets, candidate set and re-rank — the whole approximate
    pipeline is value-checked, selection included. Float-sign safety:
    min |projection| over every (vector, plane) is ~1e-4 at sf0.01/sf0.1
    (measured), nine orders above cross-engine summation noise, so bucket
    bits can never flip between engines."""

    def proj(p: int) -> str:
        h = HASH_SQL.format(x=f"concat('{p},', CAST(i - 1 AS VARCHAR))")
        return (
            "list_sum(list_transform(range(1, len(embedding)+1), i -> "
            f"CAST(embedding[i] AS DOUBLE) * (CASE WHEN {h} % 2 = 1 "
            f"THEN 1.0 ELSE -1.0 END))) AS p{p}"
        )

    projections = ", ".join(proj(p) for p in range(n_planes))
    bucket = " + ".join(
        f"(CASE WHEN p{p} > 0 THEN {2**p} ELSE 0 END)" for p in range(n_planes)
    )
    probes = " UNION ALL ".join(
        ["SELECT qid, sig AS bucket FROM qsig"]
        + [
            f"SELECT qid, xor(sig, {2**p}) AS bucket FROM qsig"
            for p in range(n_planes)
        ]
    )
    cos = COS_SQL.format(a="qe.embedding", b="ce.embedding")
    return f"""
        WITH proj AS (SELECT vec_id, {projections} FROM embeddings),
        sig AS (SELECT vec_id, CAST({bucket} AS BIGINT) AS bucket FROM proj),
        qsig AS (SELECT vec_id AS qid, bucket AS sig FROM sig WHERE vec_id < 5),
        probes AS ({probes}),
        cand AS (
            SELECT p.qid, c.vec_id
            FROM probes p JOIN sig c ON c.bucket = p.bucket
            WHERE c.vec_id <> p.qid
        ),
        scored AS (
            SELECT cand.qid, cand.vec_id, {cos} AS sim
            FROM cand
            JOIN embeddings qe ON qe.vec_id = cand.qid
            JOIN embeddings ce ON ce.vec_id = cand.vec_id
        )
        SELECT qid, vec_id, {PSIM6} AS sim, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
            FROM scored)
        WHERE rank <= {k}
    """


@query(
    "q_l10_ann_lsh",
    oracle=_lsh_oracle(),
)
def q_l10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via deterministic random-hyperplane LSH buckets + in-bucket
    exact re-rank (the 100 TB path: bucket equi-join instead of full scan).
    Selection stays approximate vs true top-k (recall measured in tests),
    but the md5-derived hyperplanes make the pipeline deterministic, so the
    oracle reproduces buckets, candidates, scores AND ranks — a full value
    check of the approximate path (r2 verdict item 4)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    out = SIM.lsh_topk(emb, queries_df, k=5, n_planes=8)
    return out.select("qid", "vec_id", pround("sim", 6).alias("sim"), "rank")


def _incremental_dedup_oracle(k: int = 16, bands: int = 8, tau: float = 0.7) -> str:
    """Batch verified-pairs SQL: the incremental index replaying the corpus
    must surface exactly these pairs (union over micro-batches of
    in-batch + cross-batch discoveries == all-pairs sharing a band bucket,
    because every pair has a later-arriving member at whose arrival the
    earlier one is already indexed)."""
    rows = k // bands
    sig_entries = ",\n            ".join(_minhash_family_sql(j) for j in range(k))
    band_cols = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows))
        + f")) AS band_{b}"
        for b in range(bands)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band_{b} AS band_hash FROM banded"
        for b in range(bands)
    )
    return f"""
        WITH base AS (
            SELECT doc_id, {WORDS_SQL} AS w FROM documents
            WHERE doc_id <= 2000
        ), g AS (
            SELECT doc_id, {GRAMS_SQL} AS grams FROM base WHERE len(w) >= 3
        ), gd AS (
            -- DISTINCT: the verify join below is per doc_id, and a
            -- duplicated doc row otherwise fans every touching pair into
            -- duplicate output rows (dup_rel variant; the engine's index
            -- emits each discovered pair once)
            SELECT DISTINCT doc_id, list_distinct(grams) AS grams FROM g
        ), sig_t AS (
            SELECT doc_id, [{sig_entries}] AS sig FROM g
        ), banded AS (
            SELECT doc_id, {band_cols} FROM sig_t
        ), bands AS ({band_union}),
        cand AS (
            SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id
        )
        SELECT id1, id2,
               {PR('CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)'
                   ' / len(list_distinct(ga.grams || gb.grams))', 6)} AS jaccard
        FROM cand
        JOIN gd ga ON ga.doc_id = id1
        JOIN gd gb ON gb.doc_id = id2
        WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
              / len(list_distinct(ga.grams || gb.grams)) >= {tau}
    """


@ext_query(
    "q_lx5_incremental_dedup",
    oracle=_incremental_dedup_oracle(),
)
def q_lx5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH dedup index (streaming/incremental_dedup.py) driven
    end-to-end: the documents corpus arrives in two out-of-id-order
    waves; each wave is probed against the band-bucket index state
    (partition-pruned read), verified candidate-only with exact n-gram
    Jaccard, then indexed. The union of discovered pairs must equal the
    batch pipeline's verified pairs — the oracle recomputes those from
    scratch in SQL, values included."""
    import os
    import tempfile

    from go_pq_cdc_elasticsearch_spark.streaming.incremental_dedup import (
        LshDedupIndex,
    )

    # capped like q_c13/q_t7: the declared row certifies replay == batch
    # semantics at every sf (the cap covers the FULL corpus at the
    # driver's sf0.01); volume is exercised by the uncapped parity test
    # in tests/test_incremental_dedup.py
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") <= 2000
    )
    from go_pq_cdc_elasticsearch_spark.sql.registry import query_work_dir

    work = query_work_dir("lshidx_q_")
    idx = LshDedupIndex(spark, os.path.join(work, "idx"), jaccard_threshold=0.7)
    parts = []
    # two waves: one cross-batch + one in-batch discovery per pair class
    # (~4.5 s of fixed job overhead per wave measured at sf0.1; the
    # three-wave, uncapped variant runs in the local parity test). NO
    # stream_partition_conf here: this query runs INSIDE the q_sx3
    # concurrent fold, and that ctx mutates the session-global shuffle
    # partition conf — concurrent sibling parts would plan under it
    # (measured: no speedup from the smaller partition count anyway).
    # eager=False (r10): each wave's serial driver-synchronous work shrinks
    # to [grams ckpt, bands ckpt, probe-bucket collect, segment append] —
    # the two waves' VERIFICATION jobs (the expensive legs) are returned
    # lazy and run together in one overlapped job at first action. Sound
    # because every input the lazy frames need is pinned per wave
    # (checkpointed grams/bands, file-list-snapshotted index segments) —
    # see process_batch's docstring. The lazy localCheckpoint on the union
    # keeps repeated driver actions (count + collect + hash) from
    # re-running the verification.
    for i, m in enumerate((1, 0)):
        parts.append(
            idx.process_batch(
                docs.filter(F.col("doc_id") % 2 == m),
                corpus=docs,
                epoch_id=i,
                eager=False,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "id1", "id2", pround("jaccard", 6).alias("jaccard")
    ).localCheckpoint(eager=False)
