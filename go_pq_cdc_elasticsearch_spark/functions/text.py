"""Text-analysis column functions (LLM-pipeline extension, SURVEY.md §2.2).

All pure column expressions (JVM-side, whole-stage codegen) — no Python in
the row path. Each has an exact SQL twin so the DuckDB oracle can verify it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deliberately small, deterministic stopword list (shared with oracles).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# Engine-portable whitespace CLASS, spelled out: Java's \s includes
# U+000B (vertical tab) while DuckDB/RE2's \s does NOT (verified live,
# review r8) — any \s in a normal form silently diverged fingerprints,
# token counts, n-grams and punct ratios between engine and oracle on
# text containing a vertical tab. Both regex engines accept the
# explicit escapes below identically.
PORTABLE_WS = " \\t\\n\\x0B\\f\\r"

# BPE-ish tokenizer regex: word pieces or single non-space symbols.
BPE_TOKEN_RE = f"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9{PORTABLE_WS}]"


_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col) -> Column:
    """Engine-portable ASCII case-fold (translate A-Z -> a-z, everything
    else untouched). lower() itself DIVERGES between engines: Java
    toLowerCase applies Unicode SpecialCasing conditionals (final sigma:
    'ΟΔΟΣ' -> 'οδος') while DuckDB's utf8proc maps unconditionally
    ('οδοσ') — verified live, review r7 — so any lower()-derived
    fingerprint/n-gram/band hash differs per engine on affected scripts.
    The ASCII fold is byte-identical in both engines (probed on Greek,
    'İ', accents); non-ASCII case differences count as CONTENT in the
    dedup normal form — the documented portable contract."""
    return F.translate(col, _ASCII_UPPER, _ASCII_LOWER)


def ascii_projected(col) -> Column:
    """Each non-ASCII CODEPOINT replaced by a single '?' — the portable
    input form for levenshtein: Spark's distance counts codepoints while
    DuckDB's counts BYTES ('café' vs 'cafe' is 1 vs 2 — verified live,
    review r7), so the engines only agree when every char is one byte.
    Projection preserves ASCII distances exactly; non-ASCII chars compare
    as a placeholder (a documented, engine-portable approximation). Both
    regex engines treat the class per-codepoint, so one multibyte char
    becomes exactly one '?'."""
    return F.regexp_replace(col, "[^\\x00-\\x7F]", "?")


def normalize_text(col) -> Column:
    """ASCII-fold + collapse whitespace + trim (dedup normal form; see
    ascii_lower for why the fold is ASCII-only).

    Order matters: trim() strips only ' ' in BOTH engines, so trimming
    BEFORE the collapse left edge tabs/newlines alive as a leading/
    trailing space ('hello world\\n' -> 'hello world ') — a different
    fingerprint than 'hello world', a missed exact-dup pair, and a
    phantom empty edge token in words() (review r5). Collapse first,
    then trim the now-plain spaces."""
    return F.trim(F.regexp_replace(ascii_lower(col), f"[{PORTABLE_WS}]+", " "))


def words(col) -> Column:
    return F.split(normalize_text(col), " ")


# ---- *_from variants over an already-computed words array ------------------
# The inline signal forms below each re-derive ``words(col)`` — a
# translate/regexp/trim/split chain — and several of them sit inside
# higher-order functions (filter/transform/aggregate), which are
# CodegenFallback: the interpreted evaluator re-runs the chain PER
# REFERENCE, with no subexpression elimination (r12, same finding as
# dedup.word_ngrams). A caller computing several signals over one text
# column should project ``words(col)`` into its own column once and use
# these ``*_from`` forms over the bound reference — CollapseProject keeps
# such a staging projection intact (non-cheap expression referenced more
# than once). The ``(col)`` forms remain for single-signal/expression-only
# contexts and delegate so the two can never drift.


def token_count_ws_from(w) -> Column:
    """``token_count_ws`` over a precomputed words array column."""
    return F.size(w).cast("long")


def token_count_ws(col) -> Column:
    """Whitespace token count. Convention: EMPTY/whitespace-only text
    counts as 1 — split('', ' ') is [''] in both Spark and DuckDB, and
    every oracle twin inlines the same len(string_split(...)) form, so
    the convention is engine-consistent by construction. Callers
    thresholding on a minimum word count are unaffected (1 fails any
    sane floor); a caller needing a true 0 for blank docs must gate on
    length(trim(text)) explicitly."""
    return token_count_ws_from(words(col))


def token_count_bpe(col) -> Column:
    """BPE-ish regex token count (letter runs / digit runs / single symbols)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0)).cast("long")


def stopword_ratio_from(w) -> Column:
    """``stopword_ratio`` over a precomputed words array column."""
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stops, x)))
    return (n_stop.cast("double") / F.size(w)).alias("stopword_ratio")


def stopword_ratio(col) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    return stopword_ratio_from(words(col))


def punct_ratio(col) -> Column:
    """Punctuation chars / total chars; NULL for the empty string — ANSI
    mode would raise DIVIDE_BY_ZERO on the bare division, and DuckDB's
    x/0 is NULL, so NULL keeps the oracles' unguarded form in parity
    (quality rules already coalesce(rule, false)).

    ASCII heuristic, stated: the class counts EVERY non-ASCII-alphanumeric
    char — accented letters, CJK, emoji — as "punctuation", so clean
    non-ASCII text scores punctuation-heavy (café -> 1/4). Deliberate and
    engine-consistent (the oracle twin uses the identical class; a
    \\p{L}-based class is not portable across the two regex engines);
    treat it as a symbol-noise signal for ASCII-dominant corpora, not a
    linguistic punctuation measure."""
    n_punct = F.length(col) - F.length(F.regexp_replace(col, f"[^a-zA-Z0-9{PORTABLE_WS}]", ""))
    return F.when(
        F.length(col) > 0, n_punct.cast("double") / F.length(col)
    )


def mean_word_len_from(w) -> Column:
    """``mean_word_len`` over a precomputed words array column."""
    total = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.size(w)


def mean_word_len(col) -> Column:
    return mean_word_len_from(words(col))


def quality_score(col) -> Column:
    """Deterministic heuristic quality score in [0,1] — NULL for the
    empty string (punct_ratio's NULL convention propagates through the
    0.3*(1-punct) term; both engines compute the same NULL, which is what
    keeps the unguarded oracle twins in parity). Callers filtering "low
    quality" must coalesce explicitly or blank docs pass the filter —
    quality_gate does exactly that:
    0.4 * length_score + 0.3 * (1 - punct_ratio) + 0.3 * stop_presence.
    length_score saturates at 200 words; stop_presence rewards a sane
    stopword rate (natural text has some function words)."""
    return quality_score_from(col, words(col))


def quality_score_from(col, w) -> Column:
    """``quality_score`` with the words array precomputed (``col`` is
    still needed raw for the punctuation ratio)."""
    n_words = token_count_ws_from(w).cast("double")
    length_score = F.least(n_words / F.lit(200.0), F.lit(1.0))
    stop_presence = F.least(stopword_ratio_from(w) * 5.0, F.lit(1.0))
    return (
        0.4 * length_score + 0.3 * (1.0 - punct_ratio(col)) + 0.3 * stop_presence
    )


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of the dedup normal form, first 16 hex chars
    (content-defined, order-free, collision-negligible at corpus scale)."""
    return F.substring(F.md5(normalize_text(col)), 1, 16)


# Marker-word tables for the n-gram/marker language-ID heuristic. The
# synthetic corpus draws from one vocabulary, so this exercises the plumbing
# (argmax over per-language evidence scores) deterministically.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "los", "y", "es"),
}


def lang_id(col) -> Column:
    """Deterministic language-ID: count marker-word hits per language over
    the token array; argmax with fixed preference order on ties. A text
    with ZERO marker hits in every language stays 'und' — the initial
    best_score must be 0, not -1: seeded at -1, the first language's
    0-hit score "won" and markerless documents were reported as 'en'
    (the oracle twin mirrored the same seed, so parity couldn't catch
    it)."""
    w = words(col)
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang, markers in LANG_MARKERS.items():
        marks = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(w, lambda x: F.array_contains(marks, x))).cast("long")
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang
