"""Repetition / self-similarity metrics for corpus quality filtering.

The repetition family of quality signals from the public Gopher paper
(Rae et al. 2021, "Scaling Language Models", appendix A1 — the MassiveText
filtering rules, reused by RefinedWeb/Dolma/FineWeb): documents dominated
by a few repeated n-grams are boilerplate/spam and get filtered before
training. Two signal shapes:

- ``top-n-gram char fraction`` (n = 2..4): fraction of the normalized
  text's characters covered by occurrences of the single most frequent
  word n-gram. Tie-break is deterministic (count desc, gram char length
  desc, gram desc) so the DuckDB oracle reproduces the value exactly.
- ``duplicate-n-gram fraction`` (n = 5..10): fraction of n-gram *positions*
  whose gram occurs more than once in the document. (Gopher counts
  covered characters with overlap bookkeeping; the position fraction is
  the same signal without the overlap-resolution step, and is exactly
  SQL-expressible — stated here so the deviation is explicit.)

Scale shape: ONE tagged explode per n (positions stay in whole-stage
codegen — no interpreted array lambdas, see PERF.md "Python-boundary
policy"), a single groupBy(doc, n, gram) count, then window top-1 and
conditional sums per (doc, n); the final per-doc pivot rides the same
doc_id hash partitioning. Shuffle carries (doc_id, n, gram-hash-sized
keys), never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.functions.text import normalize_text, words
from go_pq_cdc_elasticsearch_spark.operators.dedup import word_ngrams_from

TOP_NS = (2, 3, 4)
DUP_NS = (5, 10)

# Gopher A1 thresholds (public): drop if top-2-gram coverage > 0.20,
# top-3 > 0.18, top-4 > 0.16; dup-5-gram > 0.15, dup-10-gram > 0.10
# (the latter re-interpreted over position fractions, see module doc).
DEFAULT_THRESHOLDS = {
    "top_2_char_frac": 0.20,
    "top_3_char_frac": 0.18,
    "top_4_char_frac": 0.16,
    "dup_5_frac": 0.15,
    "dup_10_frac": 0.10,
}


def _gram_counts(
    df: DataFrame, text_col: str, id_col: str, ns: tuple[int, ...]
) -> DataFrame:
    """(id, n, gram, c) — occurrence counts of word n-grams, all n values in
    one unioned frame (one scan per n of the staged words, one shuffle).

    Each branch materializes the words array in its own projection (r12):
    the inline gram expression re-ran the tokenize chain n+2 times per
    row under the interpreted HOF evaluator — across the five n values
    that was ~34 chain evaluations per document per full pass, now 5
    (one per branch) — see word_ngrams's docstring."""
    staged = df.select(F.col(id_col), words(F.col(text_col)).alias("__words"))
    frames = []
    for n in ns:
        grams = word_ngrams_from(F.col("__words"), n)
        frames.append(
            staged.select(
                F.col(id_col),
                F.lit(n).alias("n"),
                F.explode(grams).alias("gram"),
            )
        )
    from functools import reduce

    union = reduce(DataFrame.unionByName, frames)
    return union.groupBy(id_col, "n", "gram").agg(F.count(F.lit(1)).alias("c"))


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
) -> DataFrame:
    """Per-document repetition signals.

    Returns (id, n_chars_norm, top_{n}_char_frac ... , dup_{n}_frac ...).
    Documents too short to produce any n-gram get fraction 0.0 (nothing is
    repeated), keeping the filter permissive on short texts — length gates
    are a separate signal (quality_gate).
    """
    # dedup the n values: an n in BOTH tuples would explode its grams
    # twice in the union, doubling every count — dup_n_frac read 1.0 on
    # fully unique text and top_n_char_frac doubled (confirmed by
    # execution, review r5)
    counts = _gram_counts(
        df, text_col, id_col, tuple(dict.fromkeys(tuple(top_ns) + tuple(dup_ns)))
    )

    # top-1 gram per (doc, n) — deterministic tie-break, window top-1 with
    # rank-limit pushdown (same plan family as cdc_apply). Ranked ONLY
    # over the top_ns rows and dup sums computed ONLY over the dup_ns
    # rows: the previous single pipeline ranked the 5-/10-gram populations
    # (the most numerous — roughly one gram per word position) purely so
    # an inner join could keep their dup rows, a full extra sort pass per
    # (doc, n) partition whose top value nothing read (review r7). The two
    # shapes UNION (disjoint n sets would make the old join empty); the
    # final conditional aggregation reads each metric from its own rows.
    w = Window.partitionBy(id_col, "n").orderBy(
        F.col("c").desc(), F.length("gram").desc(), F.col("gram").desc()
    )
    top = (
        counts.filter(F.col("n").isin(list(top_ns)))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            id_col,
            "n",
            (F.col("c") * F.length("gram")).cast("double").alias("top_chars"),
        )
    )
    dup = counts.filter(F.col("n").isin(list(dup_ns))).groupBy(id_col, "n").agg(
        F.sum("c").alias("total_pos"),
        F.coalesce(
            F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0)
        ).alias("dup_pos"),
    )
    per_n = top.unionByName(dup, allowMissingColumns=True)

    base = df.select(
        F.col(id_col), F.length(normalize_text(F.col(text_col))).alias("n_chars_norm")
    )
    agg_cols = []
    for n in top_ns:
        agg_cols.append(
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("top_chars"))), F.lit(0.0)
            ).alias(f"__top_{n}")
        )
    for n in dup_ns:
        agg_cols.append(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("n") == n,
                        F.col("dup_pos").cast("double") / F.col("total_pos"),
                    )
                ),
                F.lit(0.0),
            ).alias(f"dup_{n}_frac")
        )
    wide = per_n.groupBy(id_col).agg(*agg_cols)
    out = base.join(wide, id_col, "left")
    for n in top_ns:
        out = out.withColumn(
            f"top_{n}_char_frac",
            F.coalesce(F.col(f"__top_{n}") / F.col("n_chars_norm"), F.lit(0.0)),
        ).drop(f"__top_{n}")
    for n in dup_ns:
        out = out.withColumn(f"dup_{n}_frac", F.coalesce(F.col(f"dup_{n}_frac"), F.lit(0.0)))
    return out


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """df + ``rep_keep`` boolean: True iff every repetition signal is at or
    under its threshold (Gopher-style gate)."""
    th = dict(DEFAULT_THRESHOLDS if thresholds is None else thresholds)
    metric_ns = sorted({int(k.split("_")[1]) for k in th})
    top_ns = tuple(n for n in metric_ns if f"top_{n}_char_frac" in th)
    dup_ns = tuple(n for n in metric_ns if f"dup_{n}_frac" in th)
    m = repetition_metrics(df, text_col, id_col, top_ns=top_ns, dup_ns=dup_ns)
    keep = F.lit(True)
    for name, limit in sorted(th.items()):
        keep = keep & (F.col(name) <= F.lit(limit))
    flags = m.select(F.col(id_col), keep.alias("rep_keep"))
    return df.join(flags, id_col, "left").fillna({"rep_keep": True})


def quality_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.3,
    require_stopword: bool = True,
) -> DataFrame:
    """C4/Gopher-style document quality gate as pure column predicates
    (no shuffle — the whole gate pushes into the scan).

    Adds ``q_keep`` plus the individual rule booleans so downstream audits
    can attribute drops to rules (the reference pipeline's DLQ-with-reason
    pattern applied to corpus filtering).

    The words array is materialized in its own projection (r12): the
    rule signals previously re-derived the tokenize chain ~5 times per
    row (token count + mean length's two HOF references + stopword
    ratio's two), and HOFs are CodegenFallback so the interpreted
    evaluator re-runs the chain per reference — see
    functions/text.py's ``*_from`` note.
    """
    from go_pq_cdc_elasticsearch_spark.functions import text as TX

    if "__qg_words" in df.columns:
        # reserved-name discipline (the merge_batch _BUCKET_COL rule):
        # silently overwriting a caller column would corrupt its data
        raise ValueError("quality_gate reserves the column name '__qg_words'")
    t = F.col(text_col)
    out = df.withColumn("__qg_words", TX.words(t))
    w = F.col("__qg_words")
    n_words = TX.token_count_ws_from(w)
    mean_len = TX.mean_word_len_from(w)
    rules = {
        "r_min_words": n_words >= min_words,
        "r_max_words": n_words <= max_words,
        "r_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "r_symbols": TX.punct_ratio(t) <= max_symbol_ratio,
    }
    if require_stopword:
        rules["r_stopword"] = TX.stopword_ratio_from(w) > 0.0
    keep = F.lit(True)
    for name, cond in sorted(rules.items()):
        cond = F.coalesce(cond, F.lit(False))
        out = out.withColumn(name, cond)
        keep = keep & cond
    return out.withColumn("q_keep", keep).drop("__qg_words")
