"""Web-corpus cleaning rules: C4-style sentence filtering and the
Gopher rule vector.

The classic web-scale curation front line (C4: Raffel et al. 2020 §2.2;
Gopher: Rae et al. 2021 §A1.1) runs BEFORE any model-based scoring:
cheap deterministic per-document rules that drop boilerplate sentences
and rule out degenerate documents.  Both operators here are expressed
so the corpus never shuffles for the per-document part:

* :func:`c4_clean` is a single map-side projection — tokenization,
  sentence segmentation, rule evaluation and document reassembly are
  all array expressions inside one whole-stage-codegen span.  At
  100 TB this is the ideal shape: embarrassingly parallel, no state.
* :func:`gopher_rules` needs one corpus-wide signal (the top-unigram
  occupancy) that array expressions can't produce without an O(n²)
  nested loop per row, so it pays exactly two keyed shuffles
  (doc×token partial count → per-doc max) and joins the result back to
  the map-side stats on the same key.

The reference engine has no web-corpus analog (its quality gates are
the ACS sentinel scrubs, factfinder/calculate.py cleaning); these are
extensions in the training-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_factfinder_spark.functions.expr import let
from db_factfinder_spark.llmdata.textstats import tokens

__all__ = ["C4_STOPWORDS", "c4_clean", "gopher_rules"]

# C4's "terminal punctuation + ≥3 words + no bad phrase" sentence gate
# translates to this corpus (whitespace word-salad, no punctuation) as
# "long enough + contains a stopword + no blocklist token".  The
# stopword presence test stands in for terminal punctuation: both ask
# "does this look like prose rather than tag soup".
C4_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"]
C4_BADWORDS = ["javascript", "lorem", "cookie"]


def _contains_any(arr: Column, words: list[str]) -> Column:
    lits = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(arr, lambda t: F.array_contains(lits, t))) > 0


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sent_len: int = 10,
    min_sent_tokens: int = 5,
    stopwords: list[str] | None = None,
    badwords: list[str] | None = None,
    min_kept_sentences: int = 3,
    min_doc_tokens: int = 50,
    max_doc_tokens: int = 50_000,
) -> DataFrame:
    """C4-style sentence-level cleaning as ONE map-side projection.

    Tokens are segmented into fixed-length pseudo-sentences
    (``sent_len`` tokens — the corpus has no punctuation to split on);
    a sentence survives iff it has ``min_sent_tokens``+ tokens,
    contains at least one stopword, and contains no blocklist token.
    The document survives iff ``min_kept_sentences``+ sentences remain
    and the kept token count is within ``[min_doc_tokens,
    max_doc_tokens]``.

    Returns one row per input document: sentence counts, kept-token
    count, the md5 of the reassembled cleaned text (compact stand-in
    for the cleaned document), and the document-level ``kept`` flag.
    """
    stop = stopwords if stopwords is not None else C4_STOPWORDS
    bad = badwords if badwords is not None else C4_BADWORDS

    def with_toks(ts: Column) -> Column:
        n = F.size(ts)
        last = F.floor((n - F.lit(1)) / F.lit(sent_len)).cast("int")
        sents = F.when(n > 0, F.transform(
            F.sequence(F.lit(0), last),
            lambda i: F.slice(ts, i * F.lit(sent_len) + 1, sent_len),
        )).otherwise(F.array().cast("array<array<string>>"))

        def with_sents(ss: Column) -> Column:
            kept = F.filter(
                ss,
                lambda s: (F.size(s) >= min_sent_tokens)
                & _contains_any(s, stop)
                & ~_contains_any(s, bad),
            )

            def with_kept(ks: Column) -> Column:
                flat = F.flatten(ks)
                return F.struct(
                    F.size(ss).alias("n_sentences"),
                    F.size(ks).alias("n_kept"),
                    F.size(flat).alias("n_tokens_kept"),
                    F.md5(F.array_join(flat, " ")).alias("cleaned_md5"),
                )

            return let(kept, with_kept)

        return let(sents, with_sents)

    stats = docs.select(
        F.col(id_col), let(tokens(text_col), with_toks).alias("s")
    )
    return stats.select(
        id_col,
        F.col("s.n_sentences").alias("n_sentences"),
        F.col("s.n_kept").alias("n_kept"),
        F.col("s.n_tokens_kept").alias("n_tokens_kept"),
        F.col("s.cleaned_md5").alias("cleaned_md5"),
        (
            (F.col("s.n_kept") >= min_kept_sentences)
            & (F.col("s.n_tokens_kept") >= min_doc_tokens)
            & (F.col("s.n_tokens_kept") <= max_doc_tokens)
        ).alias("kept"),
    )


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stopwords: int = 2,
    min_alpha_frac: float = 0.8,
    max_top_unigram_frac: float = 0.12,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Gopher quality-rule vector: one boolean per rule plus the
    conjunction, with the underlying statistics kept for audit.

    Rules (Rae et al. 2021 §A1.1, thresholds adapted to this corpus):
    token count in ``[min_tokens, max_tokens]``; mean word length in
    ``[min_mean_word_len, max_mean_word_len]``; at least
    ``min_stopwords`` stopword occurrences; at least ``min_alpha_frac``
    of tokens purely alphabetic; top unigram occupies at most
    ``max_top_unigram_frac`` of the document.

    Plan: per-token stats are map-side; the top-unigram share needs a
    (doc, token) partial count then a per-doc max — two keyed shuffles
    on ``id_col`` — joined back on the same key, so AQE coalesces the
    exchange.  Ratios are single IEEE divisions of exact integer
    counts (cross-engine bit-identical).
    """
    stop = stopwords if stopwords is not None else C4_STOPWORDS
    stop_arr = F.array(*[F.lit(w) for w in stop])

    def with_toks(ts: Column) -> Column:
        return F.struct(
            F.size(ts).alias("n_tok"),
            F.aggregate(
                F.transform(ts, lambda t: F.length(t)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("char_sum"),
            F.size(
                F.filter(ts, lambda t: F.array_contains(stop_arr, t))
            ).cast("long").alias("stop_count"),
            F.size(
                F.filter(ts, lambda t: t.rlike("^[a-z]+$"))
            ).cast("long").alias("alpha_count"),
        )

    stats = docs.select(
        F.col(id_col), let(tokens(text_col), with_toks).alias("s")
    ).select(
        id_col,
        F.col("s.n_tok").alias("n_tok"),
        F.col("s.char_sum").alias("char_sum"),
        F.col("s.stop_count").alias("stop_count"),
        F.col("s.alpha_count").alias("alpha_count"),
    )
    top = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_count"))
    )
    nz = F.col("n_tok") > 0  # ratios are NULL (not NaN) on empty docs
    joined = stats.join(top, id_col, "left").select(
        stats[id_col].alias(id_col),
        "n_tok",
        "stop_count",
        F.when(
            nz,
            F.col("char_sum").cast("double")
            / F.col("n_tok").cast("double"),
        ).alias("mean_word_len"),
        F.when(
            nz,
            F.col("alpha_count").cast("double")
            / F.col("n_tok").cast("double"),
        ).alias("alpha_frac"),
        F.when(
            nz,
            F.coalesce(F.col("top_count"), F.lit(0)).cast("double")
            / F.col("n_tok").cast("double"),
        ).alias("top_unigram_frac"),
    )
    r_len = (F.col("n_tok") >= min_tokens) & (F.col("n_tok") <= max_tokens)
    # ratio rules are pinned FALSE (not NULL) on zero-token documents:
    # the divisions are undefined there, but an audit that counts or
    # filters on a rule boolean must still see the degenerate docs
    nonempty = F.col("n_tok") > 0
    r_mwl = F.when(
        nonempty,
        (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
    ).otherwise(F.lit(False))
    r_stop = F.col("stop_count") >= min_stopwords
    r_alpha = F.when(
        nonempty, F.col("alpha_frac") >= min_alpha_frac
    ).otherwise(F.lit(False))
    r_top = F.when(
        nonempty, F.col("top_unigram_frac") <= max_top_unigram_frac
    ).otherwise(F.lit(False))
    return joined.select(
        id_col,
        F.col("n_tok").cast("long").alias("n_tok"),
        "stop_count",
        "mean_word_len",
        "alpha_frac",
        "top_unigram_frac",
        r_len.alias("r_len"),
        r_mwl.alias("r_mwl"),
        r_stop.alias("r_stop"),
        r_alpha.alias("r_alpha"),
        r_top.alias("r_top"),
        (r_len & r_mwl & r_stop & r_alpha & r_top).alias("kept"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# (name, pattern, replacement) in PRECEDENCE order: redaction applies
# sequentially, so a span matching two entity classes (digits inside an
# email, an IP-like run inside a URL) redacts as the FIRST listed.
# Patterns stay inside the regex subset Java (Spark) and RE2 (DuckDB)
# scan identically: character classes, bounded counts, \b, \d — no
# backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rule-based PII scrub — the pre-release pass every shipped text
    corpus runs: emails, SSNs, NANP phone numbers, and IPv4 literals
    replace with typed placeholder tokens, and per-document match
    counts ride along for the release audit.

    Counts are per-pattern matches on the RAW text (independent
    scans, so a span matching two classes counts in both); the
    redacted text applies the patterns sequentially in
    ``PII_PATTERNS`` precedence order (email first — its digit runs
    would otherwise re-match as phone/IP fragments).

    Pure map-side column expressions — zero shuffles, zero UDFs; at
    100 TB this runs at scan speed and pushes nothing to the driver.
    Deterministic across engines: the patterns avoid every Java/RE2
    divergence (no backrefs/lookaround; leftmost non-overlapping scan
    semantics agree).
    """
    text = F.col(text_col)
    counts = {
        f"n_{name}": F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }
    clean = text
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        *[c.alias(n) for n, c in counts.items()],
        sum(counts.values()).alias("n_pii"),
    )
