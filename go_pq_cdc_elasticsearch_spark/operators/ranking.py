"""Full-text relevance ranking: TF-IDF statistics and BM25 scoring.

The reference ships rows INTO Elasticsearch and leaves ranked retrieval to
the ES side (`elasticsearch/bulk/bulk.go` feeds `_bulk`; queries happen in
ES). A Spark-native engine can close that loop: build the corpus statistics
(term frequencies, document frequencies, lengths) as DataFrames and score
documents against a term query with BM25 (Robertson et al., the exact
function Elasticsearch/Lucene uses by default) — so a reference user's
"index then search" workflow maps onto "aggregate then rank".

Scale shape: one explode + two groupBys (term-frequency per (doc, term),
then document-frequency per term — both partial-aggregated map-side). The
query-side statistics (N, avgdl, per-term df) are tiny aggregates joined in
via broadcast. The per-query scoring touches only rows whose term is in the
query (scan-pushable IN filter on the exploded term stream). No driver
state; the corpus stats can be persisted once and reused across queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.functions.rounding import pround
from go_pq_cdc_elasticsearch_spark.functions.text import words


def term_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Corpus statistics for ranking.

    Returns ``(tf, dl)``: ``tf`` is per-(doc, term) frequency
    ``(id_col, term, tf)``; ``dl`` is per-doc length ``(id_col, dl)``.
    Document frequency and corpus aggregates derive from ``tf`` — computed
    here once, reusable across many queries.
    """
    toks = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    return tf, dl


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with the Lucene idf: ln(1 + (N - df + 0.5) / (df + 0.5)).

    Ordering is deterministic: (round(score, 6) DESC, id) — the rounding
    makes the tie-break engine-portable. Returns ``(id_col, score)`` with
    score rounded to 6 decimals.
    """
    from collections import Counter

    tf, dl = term_stats(df, text_col, id_col)
    # query terms go through the same normalization as the index side
    # (words() lowercases the corpus): an unnormalized 'Paris' matched
    # nothing and silently scored zero — ES analyzes the query with the
    # index analyzer for the same reason (review r7)
    query_terms = [t.lower().strip() for t in query_terms]
    # bag-of-terms: a term repeated in the QUERY contributes once per
    # occurrence (Lucene scores duplicate clauses additively) — an isin
    # filter alone silently deduplicated the query
    term_mult = Counter(query_terms)
    hits = tf.filter(F.col("term").isin(list(term_mult)))
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf")
        * (F.lit(k1) + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    mult_pairs = [x for t, n in sorted(term_mult.items()) for x in (t, n)]
    mult_map = F.create_map(*[F.lit(x) for x in mult_pairs])
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "__s",
            idf * tf_part * mult_map.getItem(F.col("term")).cast("double"),
        )
        .groupBy(id_col)
        .agg(pround(F.sum("__s"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
