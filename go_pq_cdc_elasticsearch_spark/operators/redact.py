"""PII redaction over text columns (curation hygiene pass).

Large-scale pretraining pipelines scrub personally identifiable information
before training; the standard first line is pattern-based redaction of
emails, phone-ish number runs, IPv4 addresses and long digit sequences
(card/SSN shaped). Everything here is pure JVM column algebra
(``regexp_replace`` / ``regexp_count``) so it rides whole-stage codegen and
the DuckDB oracle computes identical outputs — no Python in the row path.

Patterns are deliberately conservative (high precision): the goal of the
operator is the *distributed shape* (map-only, scan-pushable, no shuffle)
and exact engine parity; swapping in richer patterns (or an NER model via a
Pandas UDF) changes only the expression, not the plan.

Scale shape: map-only — zero shuffles, no driver state; at 100 TB this is
the cheapest possible pass (pure scan + project), and the per-kind counts
aggregate map-side when rolled up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern table: (kind, regex, replacement token). Kept engine-portable:
# the same PCRE-ish source compiles identically under Java regex (Spark)
# and RE2-ish DuckDB regexp_* — no lookbehind, no backreferences.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # local@domain.tld — conservative: word chars, dots, +/- in local part
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IPv4 dotted quad
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # bare long digit runs (card/account shaped, 9+ digits) — BEFORE the
    # phone pass, which would otherwise swallow them: separator-grouped
    # numbers survive this pass (their digit groups are short) and reach
    # the phone pattern
    ("digits", r"\b[0-9]{9,}\b", "<NUM>"),
    # Phones, two conservative shapes (high precision, stated recall
    # loss): international (+country, 7+ digits, gaps <= 3 separator
    # chars) OR NANP-grouped 3-3-4 with REAL separators. Two earlier
    # forms corrupted prose: \+?[0-9][0-9()\-\s]{6,}[0-9] bounded LENGTH
    # not digit count ('pages 3 ------ 12' matched), and the optional-+
    # digit-count form \+?[0-9](?:[()\-\s]{0,3}[0-9]){6,} allowed ZERO
    # separators, so every plain 7-8 digit integer ('population 1234567')
    # and every ISO date ('2024-08-15') was redacted as <PHONE> (review
    # r7). Requiring + or the 3-3-4 separator grouping excludes dates
    # (4-2-2 / 2-2-4) and bare figures; ungrouped domestic numbers are
    # the accepted recall cost. No lookarounds — must stay RE2-portable.
    ("phone",
     r"(?:\+[0-9](?:[()\-\s]{0,3}[0-9]){6,}|\(?[0-9]{3}\)?[-.\s][0-9]{3}[-.\s][0-9]{4}\b)",
     "<PHONE>"),
]


def pii_counts(col: Column | str) -> list[Column]:
    """One ``n_<kind>`` count column per PII pattern."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(rx)).cast("long").alias(f"n_{kind}")
        for kind, rx, _ in PII_PATTERNS
    ]


def redact_text(col: Column | str) -> Column:
    """Text with every PII pattern replaced by its token, applied in the
    PII_PATTERNS order (earlier patterns shadow later ones — an email's
    digits are already gone when the digit-run pass sees the text)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, rx, token in PII_PATTERNS:
        c = F.regexp_replace(c, rx, token)
    return c


def redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document redaction record: ``(id_col, n_email, n_ipv4,
    n_digits, n_phone, clean_text)`` — count columns in PII_PATTERNS
    declaration order (digits BEFORE phone; select by name, not
    position). Counts are measured on the ORIGINAL text; ``clean_text``
    has all patterns replaced in declaration order."""
    return df.select(
        F.col(id_col),
        *pii_counts(F.col(text_col)),
        redact_text(F.col(text_col)).alias("clean_text"),
    )
