"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The standard large-scale pretraining hygiene step (GPT-3 appendix C /
PaLM-style n-gram overlap): build the distinct n-gram set of the holdout
corpus, then mark every training document containing ANY of those n-grams.
Expressed as pure DataFrame algebra so the DuckDB oracle can verify it
value-for-value.

Scale shape: the holdout gram set is tiny next to the training corpus —
Catalyst broadcasts it (or AQE picks a shuffle join if it is not); the
training side streams through one explode + one join, grouped on the doc
id. Grams travel as md5 hex strings (128-bit): a 32/64-bit key would
produce false contamination hits at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.operators.dedup import word_ngrams


def _gram_hash_rows(df: DataFrame, text_col: str, n: int, *keep) -> DataFrame:
    """Exploded md5 word-n-gram rows ``(*keep, gh)`` — the ONE gram-hash
    normal form both the train and holdout sides derive from (review r8:
    the holdout side re-spelled this inline, so a future change to the
    hashing contract applied to one copy would silently make train and
    holdout gram keys incomparable — zero contamination hits, no error)."""
    return df.select(
        *keep,
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("__gram"),
    ).select(*keep, F.md5(F.col("__gram")).alias("gh"))


def doc_gram_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Distinct word-``n``-gram md5 hashes per document: ``(id_col, gh)``."""
    return _gram_hash_rows(df, text_col, n, F.col(id_col))


def decontaminate(
    train: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-training-doc contamination against the holdout set.

    Returns ``(id_col, n_hit_grams)`` for every training document sharing
    at least one word-``n``-gram with any holdout document — the rows a
    curation pipeline would drop (anti-join) or down-weight.
    """
    # the holdout side needs no id column (the id was selected and
    # immediately discarded, crashing bare (text)-only eval-set frames
    # and carrying a dead column through the distinct — review r7); the
    # gram-hash normal form is SHARED with the train side (review r8)
    hg = _gram_hash_rows(holdout, text_col, n).distinct()
    tg = doc_gram_hashes(train, text_col, id_col, n)
    return tg.join(hg, "gh").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit_grams")
    )
