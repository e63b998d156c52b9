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
            # floor(x + 0.5): engine-portable half-up (surprisal >= 0, so
            # this equals round-half-away; in-engine round() ties are NOT
            # portable — see functions/rounding.py)
            "__mb",
            F.floor(
                F.lit(1000.0)
                * F.log2(F.col("__n").cast("double") / F.col("__c"))
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    return per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum("__mb").alias("surprisal_mb"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window token chunking (the RAG / context-window prep step):
    each document becomes ceil((n_tok - chunk)/stride) + 1 chunks of
    ``chunk_tokens`` whitespace tokens with ``overlap`` tokens shared
    between neighbors (stride = chunk_tokens - overlap); the final chunk
    is the (possibly shorter) tail.

    Returns ``(id_col, chunk_idx, n_tok_chunk, chunk_text)``.

    Scale shape: map-only — ONE projection materializes the word array per
    document, chunk starts are plain arithmetic over its size, and the
    explode emits chunk rows without re-evaluating the tokenizer (the
    interpreted-HOF pitfall documented in PERF.md). Chunks of a document
    stay in its input partition; no shuffle anywhere.
    """
    stride = chunk_tokens - overlap
    if not 0 <= overlap < chunk_tokens:
        # a negative overlap (stride > chunk_tokens) passed the old
        # stride-only check and emitted trailing chunks whose start lies
        # past the document — empty chunk_text with NEGATIVE n_tok_chunk
        # (review r7); gapped sampling is not this operator's contract
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got overlap={overlap} "
            f"chunk_tokens={chunk_tokens}"
        )
    w = df.select(
        F.col(id_col), words(F.col(text_col)).alias("__w")
    ).withColumn("__n", F.size("__w"))
    n_chunks = F.when(F.col("__n") <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((F.col("__n") - F.lit(chunk_tokens)) / F.lit(float(stride))).cast("int")
        + 1
    )
    # plain explode: the exploded VALUE of a 0-based contiguous sequence
    # already IS the chunk index (posexplode produced two identical
    # columns — review r6)
    e = w.select(
        F.col(id_col),
        F.col("__w"),
        F.col("__n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    return e.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.least(F.lit(chunk_tokens), F.col("__n") - start).cast("long").alias(
            "n_tok_chunk"
        ),
        F.concat_ws(
            " ", F.slice(F.col("__w"), start + 1, F.lit(chunk_tokens))
        ).alias("chunk_text"),
    )
