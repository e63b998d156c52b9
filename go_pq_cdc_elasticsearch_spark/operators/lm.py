"""Corpus-statistics language-model scoring (CCNet-flavored quality signal).

A unigram LM trained on the corpus itself scores each document by total
token surprisal: rare-token-heavy documents (gibberish, boilerplate codes,
non-text) score high, common-prose documents score low — the cheap
distributed stand-in for CCNet's KenLM perplexity bucketing.

Numeric contract: surprisal is quantized to integer MILLIBITS per token —
``round(1000 * log2(N / c))`` — *before* summation. Per-token values are
integers, so document sums are exact and order-independent, and the DuckDB
oracle matches bit-for-bit; a floating sum of logs would differ in the last
ulps between engines and break value hashing. (A 1-ulp log2 discrepancy
only matters within ~1e-9 of a rounding boundary — vanishing for the
finitely many (N, c) pairs.)

Scale shape: one shuffle to count tokens (map-side partial agg), one join
of the token stream against the frequency table (Catalyst broadcasts it
when the vocabulary is small; at web scale AQE falls back to a shuffle
join), one groupBy on the doc id. The corpus total N joins in as a
broadcast single-row literal — never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.functions.text import words


def unigram_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token stream ``(id_col, tok)`` over the normalized word tokens."""
    return df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("tok")
    )


def doc_surprisal_millibits(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram surprisal: ``(id_col, n_tok, surprisal_mb)``
    where ``surprisal_mb = sum over tokens of round(1000*log2(N/c))`` —
    total corpus-model information content in millibits."""
    toks = unigram_counts(df, text_col, id_col)
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__c"))
    total = freq.agg(F.sum("__c").alias("__n"))
    per_tok = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__mb",
            F.round(
                F.lit(1000.0)
                * F.log2(F.col("__n").cast("double") / F.col("__c"))
            ).cast("long"),
        )
    )
    return per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum("__mb").alias("surprisal_mb"),
    )
