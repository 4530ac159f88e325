"""PII redaction — the scrub pass a training-data pipeline runs before
publishing a corpus: replace matches of each rule's pattern with its
placeholder token and count what was removed (the counts feed the
pipeline's audit/reporting side).

Pure JVM column expressions: ``regexp_extract_all`` counts matches,
chained ``regexp_replace`` rewrites — map-side only, no shuffle, stays
inside whole-stage codegen.  Rules apply in the given order and later
rules see earlier rules' replacements (an email inside an URL is gone
by the time the URL rule runs, etc.) — order is part of the contract.

Patterns stick to the regex subset Java (Spark) and RE2 (DuckDB, for
the oracle) interpret identically: character classes, ``\\d``/``\\b``,
bounded quantifiers — no backreferences or lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (label, pattern, replacement) — order matters
DEFAULT_RULES: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "phone",
        r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
]


def redaction_counts(
    text: Column | str, rules: list[tuple[str, str, str]] | None = None
) -> dict[str, Column]:
    """``{label: count-of-matches}`` on the ORIGINAL text (counts are
    taken before any replacement so overlapping rules each report what
    they would have seen)."""
    rules = rules or DEFAULT_RULES
    c = F.col(text) if isinstance(text, str) else text
    return {
        label: F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))
        for label, pattern, _ in rules
    }


def redact(
    text: Column | str, rules: list[tuple[str, str, str]] | None = None
) -> Column:
    """Text with every rule's matches replaced by its token, rules
    applied in order."""
    rules = rules or DEFAULT_RULES
    c = F.col(text) if isinstance(text, str) else text
    for _, pattern, token in rules:
        c = F.regexp_replace(c, pattern, token)
    return c


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    rules: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Adds ``{text_col}_redacted`` plus one ``n_{label}`` count column
    per rule.  One map-side projection."""
    rules = rules or DEFAULT_RULES
    counts = redaction_counts(text_col, rules)
    return df.withColumns(
        {
            f"{text_col}_redacted": redact(text_col, rules),
            **{f"n_{label}": col for label, col in counts.items()},
        }
    )
