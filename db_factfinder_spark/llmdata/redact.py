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


def domain_blocklist_filter(
    df,
    domain_col: str,
    blocklist: list[str],
    keep: bool = False,
):
    """Suffix-match domain blocklisting — drop (or keep, for
    allowlists) every row whose dotted domain matches a blocklist
    entry at a LABEL boundary ('ads.spam.com' matches 'spam.com' but
    'notspam.com' does not).

    The scalable formulation: explode each domain into its dot-suffix
    chain ('a.b.c' → a.b.c, b.c, c — at most label-count entries,
    bounded by hostname length), equi-join the broadcast blocklist on
    the suffix, and semi/anti-join the hit ids back.  The naive
    alternative — OR of LIKE '%.suffix' predicates — is a per-row
    scan over the whole blocklist that no index or join strategy can
    help; the suffix explode turns it into ONE hashed broadcast probe
    per label.

    NULL domains never match a suffix, so blocklist mode keeps them
    and allowlist mode drops them — NULL is "unknown origin".

    Output: the filtered frame (all original columns).
    """
    labs = F.split(F.col("__dom"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(0), F.size(labs) - 1),
        lambda i: F.array_join(
            F.slice(labs, i + 1, F.size(labs) - i), "."
        ),
    )
    bl = df.sparkSession.createDataFrame(
        [(s,) for s in blocklist], "suffix string"
    )
    hits = (
        df.select(F.col(domain_col).alias("__dom"))
        .filter(F.col("__dom").isNotNull())
        .distinct()
        .select("__dom", F.explode(suffixes).alias("suffix"))
        .join(F.broadcast(bl), "suffix", "left_semi")
        .select("__dom")
        .distinct()
    )
    how = "left_semi" if keep else "left_anti"
    return df.join(hits, df[domain_col] == hits["__dom"], how)


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """Privacy audit before releasing a training corpus or derived
    table: group rows into equivalence classes over the
    quasi-identifier columns and measure how identifiable each class
    is.  Returns one row per class: the quasi values, ``class_size``
    (k-anonymity — a class smaller than ``k`` re-identifies its
    members), ``l_distinct`` (l-diversity — a class whose sensitive
    column holds one value leaks it even at large k), and ``at_risk``
    (class_size < k OR l_distinct < 2).

    One hash-aggregate shuffle on the quasi columns; both statistics
    are exact integers from the same pass (count + count distinct over
    identical grouping keys — Spark plans the distinct as a partial
    two-phase expand, still a single shuffle family).  At 100 TB this
    is the cheapest shape a release gate can have: no joins, no
    windows, and the downstream suppression step is a broadcast-able
    semi-join against the (tiny) at-risk class list.
    """
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(F.col(sensitive_col)).alias("l_distinct"),
    ).withColumn(
        "at_risk",
        (F.col("class_size") < F.lit(k)) | (F.col("l_distinct") < 2),
    )


def generalization_search(
    df,
    key_cols: list[str],
    numeric_col: str,
    widths: list[int],
    k: int,
):
    """Pick the FINEST generalization band width that achieves
    k-anonymity — the anonymization-design step before
    ``k_anonymity_audit`` signs the release.

    Privacy engineering generalizes quasi-identifiers (bucket the
    salary, truncate the zip) until every equivalence class holds ≥ k
    rows; publishing coarser than necessary destroys utility, finer
    leaks.  This evaluates every candidate width in ONE pass each
    (bucket = value DIV width, then a class-size min/histogram
    aggregate) and reports per width: ``width, n_classes,
    min_class_size, n_at_risk, achieves_k`` — the utility/privacy
    frontier, not just the winner, so the reviewer sees the trade-off.

    Scale: one groupBy per candidate width over (key_cols, bucket) —
    a fixed-width sweep of independent aggregates unioned at the end;
    candidates are a handful, data is scanned once per candidate (or
    cache the projected frame upstream).
    """
    out = None
    for w in widths:
        # floor (not DIV): floor division is the same in every engine
        # for negatives, where truncating DIV would disagree
        classes = df.groupBy(
            *key_cols,
            F.floor(F.col(numeric_col) / F.lit(w))
            .cast("long")
            .alias("__band"),
        ).agg(F.count(F.lit(1)).alias("__size"))
        row = classes.agg(
            F.lit(w).alias("width"),
            F.count(F.lit(1)).alias("n_classes"),
            F.min("__size").alias("min_class_size"),
            F.sum(F.when(F.col("__size") < k, 1).otherwise(0)).alias(
                "n_at_risk"
            ),
            (F.min("__size") >= k).alias("achieves_k"),
        )
        out = row if out is None else out.unionByName(row)
    return out
