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

from go_pq_cdc_elasticsearch_spark.functions.text import words
from go_pq_cdc_elasticsearch_spark.operators.dedup import word_ngrams_from


def _gram_hash_rows(df: DataFrame, text_col: str, n: int, *keep) -> DataFrame:
    """Exploded md5 word-n-gram rows ``(*keep, gh)`` — the ONE gram-hash
    normal form both the train and holdout sides derive from (review r8:
    the holdout side re-spelled this inline, so a future change to the
    hashing contract applied to one copy would silently make train and
    holdout gram keys incomparable — zero contamination hits, no error).

    md5 is applied INSIDE the array (transform) rather than above the
    explode (r12, guide §1.2 per-task work): a post-explode ``md5(__gram)``
    projection gets substituted by the optimizer into every downstream
    reference — the Bloom prefilter references the digest ten times per
    row — while the generator's output attribute is a bound reference
    evaluated once per gram (interleaved A/B at sf0.1: best 2.71 s ->
    2.40 s on the q_l27 probe scan). Same rows either way: md5 elementwise
    over the distinct gram set commutes with explode.

    The words array is materialized in its own projection (r12, same
    guide section): the inline ``word_ngrams`` expression references the
    tokenize chain n+2 times and the interpreted HOF evaluator re-runs
    it per reference — see ``word_ngrams``'s docstring; measured 1.62 s
    → 0.75 s on this exact shape at sf0.1."""
    return df.select(
        *keep, words(F.col(text_col)).alias("__words")
    ).select(
        *keep,
        F.explode(
            F.transform(
                F.array_distinct(word_ngrams_from(F.col("__words"), n)),
                F.md5,
            )
        ).alias("gh"),
    )


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


# hash-window offsets into the 32-char md5 hex: each "hash function" is a
# 15-hex-char (60-bit) window of the gram's md5, reduced mod m. Windows
# overlap, so they are not fully independent — that only degrades the
# false-positive rate a little, never correctness (false positives are
# removed by the exact verification join; false negatives stay impossible
# because build and probe reduce the SAME digest through the SAME windows).
_BLOOM_WINDOW_OFFSETS = (0, 3, 6, 9, 12, 15)


def _bloom_positions_py(gh_hex: str, m_bits: int, n_hashes: int) -> "list[int]":
    """Driver-side bit positions for one md5 hex digest — integer-exact
    mirror of ``_bloom_might_contain``'s JVM ``conv(substring(...))``
    arithmetic (both sides are plain base-16 parses of the same window,
    so they cannot drift)."""
    return [
        int(gh_hex[off : off + 15], 16) % m_bits
        for off in _BLOOM_WINDOW_OFFSETS[:n_hashes]
    ]


def build_gram_bloom_from_hashes(
    gram_hashes: "list[str]", bits_per_gram: int = 12, n_hashes: int = 5
) -> "tuple[bytes, int]":
    """Bloom bitmap over a collected list of md5-hex gram hashes:
    ``(bitmap_bytes, m_bits)``. 12 bits/gram with 5 hashes ≈ ~1% false
    positives — false positives only cost exact re-verification work,
    never correctness."""
    if n_hashes < 1 or n_hashes > len(_BLOOM_WINDOW_OFFSETS):
        raise ValueError(
            f"n_hashes must be 1..{len(_BLOOM_WINDOW_OFFSETS)}"
        )
    m_bits = max(64, ((bits_per_gram * max(1, len(gram_hashes)) + 7) // 8) * 8)
    bitmap = bytearray(m_bits // 8)
    for h in gram_hashes:
        for p in _bloom_positions_py(h, m_bits, n_hashes):
            bitmap[p // 8] |= 1 << (p % 8)
    return bytes(bitmap), m_bits


def _bloom_might_contain(gh, bitmap: bytes, m_bits: int, n_hashes: int):
    """JVM-only membership test against a literal bitmap: per window,
    parse the 60-bit md5 slice (conv base 16), reduce mod m, extract the
    addressed byte from the BinaryType literal (substring -> hex -> conv
    — Spark has no direct byte-to-int on binary) and test the bit. Pure
    column algebra; no Python touches the corpus scan.

    Each window's ``pos`` expression is deliberately inlined twice (byte
    address + bit mask): projecting it once and filtering over the
    column buys nothing — PushPredicateThroughProject substitutes the
    alias straight back into the predicate — and the duplicated work is
    ten 15-hex-char parses per row, noise next to the per-gram md5 the
    scan already computes (review r11)."""
    if n_hashes < 1 or n_hashes > len(_BLOOM_WINDOW_OFFSETS):
        # mirror the build side's check: silently truncating to the
        # available windows would probe bits a differently-sized build
        # never set — false negatives, the one failure class the exact
        # verification join cannot repair
        raise ValueError(
            f"n_hashes must be 1..{len(_BLOOM_WINDOW_OFFSETS)}"
        )
    lit = F.lit(bitmap)
    tests = []
    for off in _BLOOM_WINDOW_OFFSETS[:n_hashes]:
        pos = F.pmod(
            F.conv(F.substring(gh, off + 1, 15), 16, 10).cast("bigint"),
            F.lit(m_bits),
        )
        byte = F.conv(
            F.hex(F.substring(lit, (pos / 8).cast("int") + F.lit(1), F.lit(1))),
            16,
            10,
        ).cast("int")
        # 2^(pos%8) instead of shiftleft: PySpark's shiftleft takes only a
        # literal shift amount; pow is exact for exponents 0..7
        bit = F.pow(F.lit(2.0), F.pmod(pos, F.lit(8)).cast("double")).cast("int")
        tests.append(byte.bitwiseAND(bit) != F.lit(0))
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def decontaminate_bloom(
    train: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    bits_per_gram: int = 12,
    n_hashes: int = 5,
) -> DataFrame:
    """``decontaminate`` with a map-only Bloom prefilter — the 100 TB
    shape. The exact version explodes the FULL training corpus into gram
    rows and shuffles them into the holdout join; at petabyte corpora
    that shuffle dominates even though the holdout side broadcasts. Here
    the corpus scan stays map-only: every training gram is tested
    against a bitmap LITERAL (no exchange, no Python), and only the
    ~fp-rate survivors travel into the exact join that removes Bloom
    false positives. False negatives are impossible (Bloom property), so
    the result is IDENTICAL to ``decontaminate`` row-for-row — the
    oracle for the sketch path is the exact path.

    The holdout is evaluated EXACTLY ONCE: its distinct gram hashes are
    pinned with a localCheckpoint and collected from it (bounded by the
    same small-holdout contract as the broadcast query set in cosine
    top-k — a benchmark suite is KBs-to-MBs next to a 100 TB corpus),
    the bitmap is built driver-side from the collected digests, and the
    verification join broadcasts the SAME checkpointed frame — r12: the
    digests previously made a second driver->JVM round trip as a
    createDataFrame local relation (~0.5 s at sf0.1) that the checkpoint
    already holds distributed. The bitmap rides the PLAN as a literal
    (12 bits per holdout gram — ~1.5 MB for a million-gram eval suite);
    a holdout too big for that is outside this operator's contract and
    should use ``decontaminate`` directly."""
    hg = (
        _gram_hash_rows(holdout, text_col, n)
        .distinct()
        .localCheckpoint(eager=False)
    )
    hashes = [r["gh"] for r in hg.collect()]
    bitmap, m_bits = build_gram_bloom_from_hashes(
        hashes, bits_per_gram, n_hashes
    )
    tg = doc_gram_hashes(train, text_col, id_col, n)
    candidates = tg.filter(
        _bloom_might_contain(F.col("gh"), bitmap, m_bits, n_hashes)
    )
    return candidates.join(F.broadcast(hg), "gh").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit_grams")
    )
