"""Text analysis operators — all pure column expressions (no UDFs,
no shuffles; they run map-side at any scale).

Tokenization is deliberately simple and *portable*: lowercase,
whitespace split.  The point at 100 TB is that these run inside
whole-stage codegen over the scan, so a quality-filter pass over a
corpus costs one read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from db_factfinder_spark.functions.expr import let

# Tiny per-language function-word lists for the n-gram/stopword
# language-ID heuristic.  Real deployments swap in fastText etc. via a
# pandas UDF; the heuristic keeps everything JVM-side.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "las"],
    "fr": ["le", "la", "de", "et", "un", "une", "les", "des", "que", "est"],
    "de": ["der", "die", "das", "und", "ein", "eine", "zu", "den", "von", "ist"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(F.trim(t)), r"\s+"), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# BPE-ish pre-tokenizer classes: letter runs, single digits (BPE
# vocabularies split numbers aggressively), punctuation runs.  The
# pattern is engine-portable (same matches under Java regex and RE2).
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]+"


def bpe_token_count(text: Column | str) -> Column:
    """Approximate BPE token count via the pre-tokenizer regex — the
    cheap corpus-costing pass (real tokenizers run as pandas UDFs; the
    regex stays JVM-side in the scan)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def _stop_ratio_of(toks: Column, stopwords: list[str]) -> Column:
    stops = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.try_divide(hits.cast("double"), F.size(toks).cast("double"))


def stopword_ratio(text: Column | str, stopwords: list[str]) -> Column:
    return let(tokens(text), lambda toks: _stop_ratio_of(toks, stopwords))


def punct_ratio(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return F.try_divide(punct.cast("double"), F.length(t).cast("double"))


def _mean_token_length_of(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    return F.try_divide(total, F.size(toks).cast("double"))


def mean_token_length(text: Column | str) -> Column:
    return let(tokens(text), _mean_token_length_of)


def quality_score(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Composite document-quality heuristic in [0, 1]: rewards
    reasonable length, low punctuation noise, natural stopword density
    and word lengths — the standard cheap pre-filter before expensive
    model-based scoring.  Tokenizes once (let-bound) for the three
    token-based components."""
    stopwords = stopwords or LANG_STOPWORDS["en"]

    def score(toks: Column) -> Column:
        n_tok = F.size(toks).cast("double")
        len_score = F.least(F.try_divide(n_tok, F.lit(100.0)), F.lit(1.0))
        punct_score = F.lit(1.0) - F.least(
            F.coalesce(punct_ratio(text), F.lit(0.0)) * 4, F.lit(1.0)
        )
        stop_score = F.least(
            F.coalesce(_stop_ratio_of(toks, stopwords), F.lit(0.0)) * 3, F.lit(1.0)
        )
        mtl = F.coalesce(_mean_token_length_of(toks), F.lit(0.0))
        word_score = F.when((mtl >= 2.0) & (mtl <= 12.0), F.lit(1.0)).otherwise(
            F.lit(0.0)
        )
        # addition order is load-bearing: the DuckDB oracle adds in
        # this exact order and float + is not associative
        return (len_score + punct_score + stop_score + word_score) / 4

    return let(tokens(text), score)


def token_profile(text: Column | str, stopwords: list[str]) -> Column:
    """Token count, stopword ratio and mean token length as ONE struct
    from ONE tokenization — selecting the three stats as independent
    columns re-runs the tokenize pipeline per column (no CSE across
    projection items).  Values are identical to the stand-alone
    functions (same token array feeds the same folds)."""

    def build(toks: Column) -> Column:
        return F.struct(
            F.size(toks).alias("n_tokens"),
            _stop_ratio_of(toks, stopwords).alias("stop_ratio"),
            _mean_token_length_of(toks).alias("mean_tok_len"),
        )

    return let(tokens(text), build)


def language_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit ratios."""
    return {
        lang: stopword_ratio(text, words) for lang, words in LANG_STOPWORDS.items()
    }


def language_id(text: Column | str) -> Column:
    """Argmax language by stopword-hit ratio; 'und' when nothing hits.
    Deterministic tie-break: language order in LANG_STOPWORDS.
    Tokenizes once for all languages (let-bound)."""

    def pick(toks: Column) -> Column:
        pairs = F.array(
            *[
                F.struct(
                    F.coalesce(_stop_ratio_of(toks, words), F.lit(0.0)).alias(
                        "score"
                    ),
                    F.lit(lang).alias("lang"),
                )
                for lang, words in LANG_STOPWORDS.items()
            ]
        )
        best = F.aggregate(
            pairs,
            F.struct(F.lit(-1.0).alias("score"), F.lit("und").alias("lang")),
            lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc),
        )
        return let(
            best,
            lambda b: F.when(b["score"] <= 0.0, F.lit("und")).otherwise(b["lang"]),
        )

    return let(tokens(text), pick)


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    t = F.col(text) if isinstance(text, str) else text
    t = F.lower(t)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Content-defined, so re-ingestion / re-partitioning can't change it."""
    return F.md5(normalize_text(text))


def rolling_hash(text: Column | str, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over the normalized text's characters —
    the classic Rabin-Karp fingerprint, as a sequential aggregate over
    the character array (deterministic, order-sensitive)."""
    chars = F.split(normalize_text(text), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text profile: token count, punctuation/stopword ratios,
    quality score, language guess, fingerprint."""
    return df.withColumns(
        {
            "n_tokens": token_count(text_col),
            "punct_ratio": punct_ratio(text_col),
            "stopword_ratio": stopword_ratio(text_col, LANG_STOPWORDS["en"]),
            "mean_token_len": mean_token_length(text_col),
            "quality": quality_score(text_col),
            "lang_guess": language_id(text_col),
            "fingerprint": fingerprint(text_col),
        }
    )


def surprisal_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Per-document unigram *surprisal* score — the model-free stand-in
    for LM-perplexity quality filtering (CCNet buckets documents by a
    KenLM score; with no model shipped, the corpus's own unigram
    distribution is the universal fallback): documents whose tokens
    are rare corpus-wide score high (jargon, noise, rich content),
    boilerplate of common tokens scores low.

    Rational-surprisal house rule (see bm25_search/tfidf_top_terms):
    per token the inverse unigram probability N/c_w replaces
    −log(c_w/N) — each N/c_w is ONE correctly-rounded IEEE division of
    exact bigints, where a log chain would accumulate libm last-bit
    error in engine-specific order.  Monotone in the same direction
    (rarer ⇒ larger), so threshold filters rank documents identically.
    Per-token values are 1e-6 fixed-pointed to bigints, scaled by the
    doc's term frequency (exact integer product) and integer-summed
    (order-free); the final mean is one double division of bigints.

    Plan: explode → (doc, token) counts (shuffle on doc+token) →
    vocabulary counts (shuffle on token) → keyed join of tf to vocab →
    doc re-agg; the corpus total N rides along as a one-row broadcast.
    No pairwise work anywhere — everything is linear in corpus tokens,
    the vocabulary join is an equi-join, and both aggregations combine
    map-side at 100 TB.

    Output: ``id_col, n_tokens, sum_micro, surprisal`` (mean inverse
    unigram probability; ≥ 1.0, = vocabulary size for all-distinct
    uniform corpora).  Token-less documents are excluded (score
    undefined), mirroring token_diversity.
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    # tf feeds the vocabulary roll-up AND the contribution join —
    # materialized so the corpus tokenizes once, not per consumer
    tf = materialize(
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("c_dt")),
        checkpoint_mode,
    )
    vocab = tf.groupBy("t").agg(F.sum("c_dt").alias("c_w"))
    total = vocab.agg(F.sum("c_w").alias("n_total"))
    micro = F.floor(
        F.col("n_total").cast("double") / F.col("c_w").cast("double")
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    contrib = tf.join(vocab, "t").crossJoin(F.broadcast(total)).select(
        F.col(id_col),
        F.col("c_dt"),
        (F.col("c_dt") * micro).alias("micro_tot"),
    )
    return (
        contrib.groupBy(id_col)
        .agg(
            F.sum("c_dt").alias("n_tokens"),
            F.sum("micro_tot").alias("sum_micro"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_micro",
            (
                F.col("sum_micro").cast("double")
                / (F.col("n_tokens") * F.lit(1000000)).cast("double")
            ).alias("surprisal"),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition profile (the Gopher-rule boilerplate
    signals): per document the distinct-token ratio, the fraction of
    tokens taken by the single most frequent token, and the fraction
    of 2-gram slots taken by the most frequent 2-gram.  Machine-
    generated/boilerplate text scores low distinct ratio and high top
    fractions; the standard cheap filter thresholds on these.

    Set-based, not per-row loops: explode once, count per (doc, gram),
    re-aggregate per doc — two shuffles on the doc id for any corpus
    size, partial aggregation map-side.  Token-less documents yield
    NULL ratios (no signal, distinct from a zero score)."""
    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    )
    unigrams = toks.select("id", F.explode("toks").alias("g"))
    uni = (
        unigrams.groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
    )
    bigrams = toks.select(
        "id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.concat_ws(
                        " ", F.get("toks", i - 1), F.get("toks", i)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    bi = (
        bigrams.groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bi_c"))
    )
    base = df.select(F.col(id_col).alias("id"))
    out = base.join(uni, "id", "left").join(bi, "id", "left")
    return out.select(
        F.col("id").alias(id_col),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
            "distinct_ratio"
        ),
        (F.col("top_c").cast("double") / F.col("n_tokens")).alias(
            "top_token_frac"
        ),
        (F.col("top_bi_c").cast("double") / F.col("n_bigrams")).alias(
            "top_bigram_frac"
        ),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str,
    order_col: str = "doc_id",
    part_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents concatenate in
    ``order_col`` order (within ``part_col`` streams if given) and the
    token stream splits into fixed ``seq_len`` chunks.  Each document
    gets the chunk id and offset where it starts — the assignment step
    of pretraining batch packing (the actual token copy happens at
    tokenization time, shaped by this map).

    One window cumsum per stream — a single shuffle; the running total
    over long→long is exact, so the mapping is deterministic on any
    cluster layout."""
    w = Window.orderBy(order_col) if part_col is None else (
        Window.partitionBy(part_col).orderBy(order_col)
    )
    cum_before = F.coalesce(
        F.sum(token_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return df.withColumns(
        {
            "start_offset_total": cum_before,
            "chunk_id": F.floor(cum_before / seq_len),
            "chunk_offset": cum_before % seq_len,
        }
    )


def token_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document lexical concentration via the Simpson index —
    the repetition signal that catches keyword-stuffed / template
    pages whose *distinct ratio* still looks healthy (many distinct
    tokens, but a few dominate the mass).

    simpson = Σ c² / n²  (probability two sampled tokens match);
    eff_vocab = n² / Σ c²  (inverse Simpson — the "effective number
    of distinct tokens", n²/Σc² = n for a flat distribution, → 1 as
    one token takes over).  Both are one IEEE division of EXACT
    integers (Σ c² of bigint counts), so any engine agrees
    bit-for-bit — unlike Shannon entropy, whose Σ c·ln c accumulates
    libm last-bit error in an engine-specific order.

    Plan: explode → (doc, token) counts → per-doc re-agg.  Two
    shuffles on the doc id, no joins; at 100 TB both aggregations
    partial map-side.  Empty/NULL docs are excluded (no tokens, the
    index is undefined).

    Output: ``id_col, n_tokens, n_distinct, sum_c2, simpson,
    eff_vocab``.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("t")
    )
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("c"))
    n2 = F.col("n_tokens") * F.col("n_tokens")
    return (
        tf.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_distinct",
            "sum_c2",
            (F.col("sum_c2").cast("double") / n2.cast("double")).alias(
                "simpson"
            ),
            (n2.cast("double") / F.col("sum_c2").cast("double")).alias(
                "eff_vocab"
            ),
        )
    )


def bm25_search(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25's
    saturation + length normalization (Robertson & Spärck Jones
    probabilistic relevance framework), with the same *rational* idf
    substitution as ``tfidf_top_terms``: idf = (N − df + ½)/(df + ½)
    instead of its log.  Rationale is identical — every input to the
    score is an exact integer or an exact half, the per-term score is
    a fixed chain of correctly-rounded IEEE ops, and log-idf's libm
    last bit would make near-tie rankings engine-specific.  Per term
    the substitution is a monotone transform of Robertson–Spärck
    Jones idf, so single-term rankings match BM25 exactly; across
    terms rare terms weigh relatively more than under log.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    summed in FIXED term order (query-list order, folded left) so the
    double accumulation is engine-identical.

    Plan: postings = explode → filter to the query vocabulary (the
    only postings read) → (doc, term) tf counts; df(t) and avgdl are
    vocabulary- and corpus-constant 1-row/|q|-row broadcasts; scores
    pivot term-wise into fixed columns (conditional agg on the ≤|q|
    postings per doc), then one TakeOrdered for the top-k — nothing
    pairwise exists.  The ``lens`` and ``postings`` frames each feed
    two consumers (stats + join, per-doc + df) and Catalyst shares no
    subtree between them, so both are materialized once (same
    ``checkpoint_mode`` rule as tfidf_top_terms) — without it the
    corpus is tokenized four times instead of twice.

    Output: ``id_col, n_terms_hit, score, rank`` for the top-k
    (score desc, id asc).
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    lens = materialize(
        df.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col), F.size(tokens(text_col)).alias("dl")
        ),
        checkpoint_mode,
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    postings = materialize(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
        .filter(F.col("t").isin(*terms))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf")),
        checkpoint_mode,
    )
    dfc = postings.groupBy("t").agg(
        F.count(F.lit(1)).alias("df")
    )
    # pivot the ≤|terms| postings per doc into fixed (tf_i, df_i)
    # columns so the cross-term sum has one engine-independent order
    per_doc = (
        postings.join(F.broadcast(dfc), "t")
        .groupBy(id_col)
        .agg(
            *[
                F.sum(F.when(F.col("t") == t, F.col("tf"))).alias(f"tf_{i}")
                for i, t in enumerate(terms)
            ],
            *[
                F.sum(F.when(F.col("t") == t, F.col("df"))).alias(f"df_{i}")
                for i, t in enumerate(terms)
            ],
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    joined = (
        per_doc.join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "avgdl",
            F.col("sum_dl").cast("double") / F.col("n_docs").cast("double"),
        )
    )

    def term_score(i: int) -> Column:
        tf = F.col(f"tf_{i}").cast("double")
        dfv = F.col(f"df_{i}").cast("double")
        idf = (F.col("n_docs").cast("double") - dfv + F.lit(0.5)) / (
            dfv + F.lit(0.5)
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b)
            * (F.col("dl").cast("double") / F.col("avgdl"))
        )
        return F.coalesce(
            idf * (tf * F.lit(k1 + 1.0) / denom), F.lit(0.0)
        )

    score = term_score(0)
    for i in range(1, len(terms)):
        score = score + term_score(i)
    scored = joined.withColumn("score", score)
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
            ),
        )
        .select(id_col, "n_terms_hit", "score", "rank")
    )


def bpe_merge_candidates(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """One step of BPE tokenizer training (Sennrich et al. 2016,
    arXiv:1508.07909): corpus-weighted counts of adjacent symbol
    pairs, ranked — the pair that wins is the next merge rule.  Run
    over a 100 TB corpus this IS how production vocabularies are
    built; the engine-shaped insight is that after the word-frequency
    roll-up ALL remaining work is vocabulary-sized, not corpus-sized.

    Plan: tokens → (word, freq) counts (the only corpus-scale
    shuffle); each DISTINCT word explodes into its adjacent character
    pairs ×freq (map-side over the vocab frame); one vocab-scale
    count; TakeOrdered.  Exact integers throughout.

    Output: ``lhs, rhs, pair_count, rank`` — top-``k`` by
    (pair_count desc, lhs, rhs).  (Named lhs/rhs: LEFT/RIGHT are SQL
    keywords and would force quoting in every downstream query.)
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = words.select(
        "w", "freq", F.split(F.col("w"), "").alias("cs")
    )
    # single-character words have no pairs AND must not reach
    # sequence(1, size-1): Spark's sequence STEPS BACKWARD when
    # start > stop, so size=1 would evaluate cs[1] out of bounds
    # (ANSI error), not an empty list
    pairs = chars.filter(F.size("cs") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(cs) - 1),"
                " i -> struct(cs[i - 1] AS l, cs[i] AS r))"
            )
        ).alias("p"),
    )
    counted = (
        pairs.select(F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs"), "freq")
        .groupBy("lhs", "rhs")
        .agg(F.sum("freq").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    return (
        counted.orderBy(
            F.col("pair_count").desc(),
            F.col("lhs").asc(),
            F.col("rhs").asc(),
        )
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(
                    F.col("pair_count").desc(),
                    F.col("lhs").asc(),
                    F.col("rhs").asc(),
                )
            ),
        )
    )


def collocation_lift(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 30,
    min_pair_count: int = 2,
    k: int = 50,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Top-``k`` term-pair collocations by lift — the rational core of
    PMI: lift(x,y) = P(x,y)/(P(x)·P(y)) = (c_xy·N)/(c_x·c_y) over
    document-level presence counts (PMI is log of this; the log is
    monotone, so the RANKING is PMI's, while the statistic stays an
    exact-integer ratio any engine reproduces bit-for-bit — the same
    libm-avoidance rationale as tfidf_top_terms).

    The pair space is pruned BEFORE the self-join, which is what makes
    this safe at corpus scale: only the top-``vocab_size`` terms by
    document frequency (df desc, term asc — deterministic) enter the
    join, so each document contributes at most C(vocab_size, 2) pairs
    regardless of its length, and the join itself is an equi-join on
    the document id — never an all-pairs token product.

    Plan: presence (doc, term distinct) is materialized once (feeds
    the df roll-up and both join sides); the vocabulary and the
    per-term counts broadcast; pair counts shuffle on the pair key;
    one TakeOrdered for the final ranking.

    Output: ``t1, t2, c_pair, c1, c2, lift, rank`` with t1 < t2,
    ranked by (lift desc, t1, t2).
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    presence = materialize(
        df.select(
            F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("t")
        ),
        checkpoint_mode,
    )
    dfc = presence.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        dfc.orderBy(F.col("c").desc(), F.col("t").asc())
        .limit(vocab_size)
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    pres_v = presence.join(
        F.broadcast(vocab.select("t")), "t", "left_semi"
    )
    a = pres_v.select(F.col(id_col), F.col("t").alias("t1"))
    b = pres_v.select(F.col(id_col), F.col("t").alias("t2"))
    pairs = (
        a.join(b, id_col)
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .filter(F.col("c_pair") >= min_pair_count)
    )
    c1 = vocab.select(F.col("t").alias("t1"), F.col("c").alias("c1"))
    c2 = vocab.select(F.col("t").alias("t2"), F.col("c").alias("c2"))
    lift = (F.col("c_pair") * F.col("n_docs")).cast("double") / (
        F.col("c1") * F.col("c2")
    ).cast("double")
    scored = (
        pairs.join(F.broadcast(c1), "t1")
        .join(F.broadcast(c2), "t2")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("lift", lift)
    )
    return (
        scored.orderBy(
            F.col("lift").desc(), F.col("t1").asc(), F.col("t2").asc()
        )
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(
                    F.col("lift").desc(), F.col("t1").asc(), F.col("t2").asc()
                )
            ),
        )
        .select("t1", "t2", "c_pair", "c1", "c2", "lift", "rank")
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Per-document top-``k`` characteristic terms by tf-idf, using the
    *rational* idf variant score = tf · N / df (N = corpus size, df =
    documents containing the term).  Rational rather than log idf is a
    deliberate exactness choice: tf·N is an exact integer and one IEEE
    division is correctly rounded, so the score — and therefore the
    ranking — is bit-identical on any engine, while log-idf's libm
    last-bit differences could flip near-ties.  The ranking it induces
    equals log-idf's whenever tf is constant (both are monotone
    decreasing in df) and stays a standard tf-idf-family weighting.

    Plan: explode → (doc, term) counts → term doc-frequencies → join
    back → per-doc top-k window.  The df table is vocabulary-sized;
    at 100 TB broadcast it when the vocabulary fits (Spark's AQE
    converts the join automatically below the threshold) — nothing
    here is pairwise or driver-side.  N arrives as a broadcast 1-row
    cross join, not a collected literal, so the plan stays lazy.

    The tf frame is materialized once (per ``checkpoint_mode``, same
    reuse rule as the dedup pipelines): it feeds both the join probe
    side and the doc-frequency roll-up, and Catalyst shares no
    subtree between the two — inline, the tokenize→explode→count
    pipeline would run twice over the corpus (measured ~25% of the
    query at sf0.1).
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = materialize(
        toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")),
        checkpoint_mode,
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    score = (F.col("tf") * F.col("n_docs")).cast("double") / F.col(
        "df"
    ).cast("double")
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def char_chunker_udtf(size: int, stride: int):
    """Python UDTF (Spark 4 `@udtf`) producing overlapping character
    windows of a string: one input row → ⌈len/stride⌉ chunk rows of
    ``size`` chars starting every ``stride`` (overlap = size−stride;
    ``stride == size`` gives valid non-overlapping full coverage).
    The UDTF is the right tool precisely where `explode(transform(
    sequence(...)))` gets awkward — per-row variable fan-out with
    imperative logic — while staying Arrow-batched and lateral-join
    composable (`... FROM docs d, LATERAL chunk(d.text)`).

    Rows are a pure function of the input string, so a SQL oracle
    re-derives every chunk with substr arithmetic — UDTF ≠ unchecked.

    Returns the UDTF class, ready for ``spark.udtf.register``.
    ``size ≥ stride ≥ 1`` required (every character covered, bounded
    fan-out).
    """
    if not (size > 0 and 0 < stride <= size):
        raise ValueError("need size > 0 and 0 < stride <= size")
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, start_pos int, piece string")
    class CharChunker:
        def eval(self, text: str):
            if text is None:
                return
            n = len(text)
            cid = 0
            for start in range(0, max(n, 1), stride):
                yield (cid, start + 1, text[start : start + size])
                cid += 1
                if start + size >= n:
                    break

    return CharChunker


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase (consecutive-token) search via positional postings.

    Conjunctive search (``q120``-style membership) can't distinguish
    "hash join" from "join ... hash"; phrase queries need token
    POSITIONS.  The plan: posexplode the normalized token stream into
    (doc, term, pos) postings, prune to the query vocabulary, then
    chain-join term i+1's postings at pos+1.  A k-term phrase is k−1
    equi-joins on (doc, expected position) — no window over the full
    token stream, and the corpus text is read exactly ONCE (the
    vocabulary filter sits directly above the scan).  A production
    search deployment persists the postings frame once
    (``build_postings``) and serves every query from per-term fetches
    (``phrase_search_postings``); this convenience wrapper is that
    query plan with the build inlined.

    Output: ``<id_col>, n_hits`` (occurrence count per matching doc) —
    exact integers.
    """
    postings = build_postings(docs, text_col, id_col)
    return phrase_search_postings(postings, phrase, id_col=id_col)


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional postings ``(t, <id_col>, pos)`` over the normalized
    token stream — the persisted inverted index phrase/proximity
    queries fetch from.  Build it ONCE per corpus snapshot (write
    bucketed by ``t`` for shuffle-free term fetches); every query
    after that touches only its own terms' postings, never corpus
    text — the ``hll_partials``/``build_corpus_state`` persisted-state
    pattern applied to search."""
    return docs.filter(F.col(text_col).isNotNull()).select(
        id_col,
        F.posexplode(tokens(normalize_text(text_col))).alias("pos", "t"),
    )


def phrase_search_postings(
    postings: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase match over a prebuilt postings frame: prune to the
    query vocabulary, then k−1 equi-joins on (doc, pos+i).  Output:
    ``<id_col>, n_hits`` (overlapping occurrences each count)."""
    if len(phrase) < 2:
        raise ValueError("phrase needs >= 2 tokens")
    pruned = postings.filter(F.col("t").isin(*phrase))
    cur = (
        pruned.filter(F.col("t") == phrase[0])
        .select(id_col, F.col("pos").alias("p0"))
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = pruned.filter(F.col("t") == term).select(
            id_col, (F.col("pos") - F.lit(i)).alias("p0")
        )
        cur = cur.join(nxt, [id_col, "p0"])
    return cur.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))


def bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Add-one-smoothed bigram language model table over the corpus —
    the count-based next-token model used for cheap perplexity-style
    quality filtering (complements the unigram surprisal score, which
    ignores word order).

    Bigrams come from zipping each token array with its own tail
    (``slice``/``arrays_zip`` — pure JVM array ops in the scan, no
    positional self-join, no window over token streams); documents
    shorter than two tokens contribute nothing.  ``c_prev`` (bigram
    rows starting with w1) rides on a window over the counts table —
    grouped state, not a second corpus pass — and the vocabulary size
    is the one scalar broadcast.  P(w2|w1) = (c+1)/(c_prev+V) is
    exact-integer until the single division.

    Scale: corpus text is scanned once; everything after the bigram
    groupBy is vocabulary-bounded (≤ |V|² rows, in practice the
    observed-bigram count), so the model table stays joinable as a
    broadcast/bucketed dimension for scoring passes.

    Output: ``w1, w2, c_bigram, c_prev, vocab, p_smoothed``.
    """
    toks = tokens(normalize_text(text_col))
    arr = (
        docs.filter(F.col(text_col).isNotNull())
        .select(toks.alias("ts"))
        .filter(F.size("ts") >= 2)
    )
    pairs = arr.select(
        F.explode(
            F.arrays_zip(
                F.slice("ts", 1, F.size("ts") - 1).alias("w1"),
                F.slice(F.col("ts"), F.lit(2), F.size("ts") - 1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_bigram")
    )
    c_prev = F.sum("c_bigram").over(Window.partitionBy("w1"))
    vocab = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(toks).alias("t"))
        .agg(F.count_distinct("t").alias("vocab"))
    )
    return (
        counts.withColumn("c_prev", c_prev)
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            "c_bigram",
            "c_prev",
            "vocab",
            (
                (F.col("c_bigram") + F.lit(1)).cast("double")
                / (F.col("c_prev") + F.col("vocab")).cast("double")
            ).alias("p_smoothed"),
        )
    )


def proximity_search(
    postings: DataFrame,
    term_a: str,
    term_b: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """NEAR/k proximity query over a postings frame: per document, the
    number of (occurrence_a, occurrence_b) pairs within ``k`` token
    positions of each other, either order — the relevance signal
    between exact-phrase (q192/q199) and bag-of-words (q120/q149).

    The naive form is an inequality join over positions (|pa−pb| ≤ k)
    — a per-document cross product on frequent terms.  This plan
    band-buckets positions instead (bucket = pos div k): any
    qualifying pair sits in the same or an adjacent bucket, so the
    candidate join is an EQUI-join on (doc, bucket) with the smaller
    term's postings exploded to its 3 neighbor buckets (the spatial
    grid-join technique, `operators/spatial.py`, applied to the 1-D
    position axis); the |pa−pb| ≤ k verify runs on candidates only.
    All-integer arithmetic.

    Output: ``<id_col>, n_pairs``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if term_a == term_b:
        raise ValueError("proximity terms must differ")
    pa = postings.filter(F.col("t") == term_a).select(
        id_col, F.col("pos").alias("pa"),
        F.explode(
            F.array(
                (F.col("pos") / k).cast("long") - 1,
                (F.col("pos") / k).cast("long"),
                (F.col("pos") / k).cast("long") + 1,
            )
        ).alias("bk"),
    )
    pb = postings.filter(F.col("t") == term_b).select(
        id_col, F.col("pos").alias("pb"),
        (F.col("pos") / k).cast("long").alias("bk"),
    )
    return (
        pa.join(pb, [id_col, "bk"])
        .filter(F.abs(F.col("pa") - F.col("pb")) <= k)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def top_p_truncate(
    counts: DataFrame,
    group_col: str,
    item_col: str,
    count_col: str,
    p_num: int,
    p_den: int,
) -> DataFrame:
    """Nucleus (top-p) truncation per group: keep the SMALLEST prefix
    of items — ordered by count descending, item ascending — whose
    cumulative share of the group's total mass reaches p = p_num /
    p_den.  The vocabulary-truncation step of nucleus sampling and of
    long-tail vocabulary pruning before tokenizer training.

    The keep rule "row r is in the minimal covering prefix iff the
    mass BEFORE r is still short of target" is evaluated in exact
    integer cross-multiplied form —

        (cum − cnt) · p_den < p_num · total

    — so no float share ever decides a boundary item (a cumulative
    double at p = 0.9 can tip either way in the last ulp).  The
    probability p is taken as an exact rational, matching how configs
    state it ("0.9" = 9/10).

    One keyed groupBy to the (group, item) grain feeds two window
    passes over that grain (cumulative and group-total) — both
    partitioned by group, bounded by vocabulary, never by corpus
    rows.  Output: kept rows only, with ``rank`` (1-based prefix
    position) and ``cum`` (cumulative count through the row).
    """
    if not (0 < p_num <= p_den):
        raise ValueError("need 0 < p_num <= p_den")
    order = Window.partitionBy(group_col).orderBy(
        F.col(count_col).desc(), F.col(item_col).asc()
    )
    w_cum = order.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = counts.select(
        group_col,
        item_col,
        F.col(count_col).alias("cnt"),
        F.row_number().over(order).alias("rank"),
        F.sum(count_col).over(w_cum).cast("long").alias("cum"),
        F.sum(count_col).over(w_all).cast("long").alias("__total"),
    )
    return ranked.filter(
        (F.col("cum") - F.col("cnt")) * p_den < p_num * F.col("__total")
    ).drop("__total")


def skipgram_counts(
    docs: DataFrame,
    window: int = 2,
    min_count: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Skip-gram (center, context) co-occurrence counts within ±
    ``window`` token positions — the corpus statistic word2vec/GloVe
    training consumes, and a positional sharpening of
    ``collocation_lift`` (which only knows doc-level co-presence).

    Built by REUSE: tokenize to (doc, position, token) rows, run
    ``sequential_pairs`` (the lead-k window that replaces the
    position-range self-join) over positions for the forward
    neighborhood, then symmetrize — a forward pair (a, b) is the two
    skip-grams a→b and b→a, so the symmetric count table is the
    forward table summed with its swap.  Work: tokens × window rows
    through one keyed window, one groupBy; never a positions².

    Output: ``center, context, n`` with ``n >= min_count``.
    """
    from db_factfinder_spark.operators.funnel import sequential_pairs

    toks = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__doc"),
            F.posexplode(tokens(text_col)).alias("__pos", "__tok"),
        )
    )
    fwd = sequential_pairs(
        toks,
        max_gap=window,
        key_col="__doc",
        ts_col="__pos",
        event_col="__tok",
        tiebreak_col="__pos",
        with_support=False,
    ).select("a", "b", "n_pairs")
    sym = fwd.select(
        F.col("a").alias("center"),
        F.col("b").alias("context"),
        "n_pairs",
    ).unionByName(
        fwd.select(
            F.col("b").alias("center"),
            F.col("a").alias("context"),
            "n_pairs",
        )
    )
    return (
        sym.groupBy("center", "context")
        .agg(F.sum("n_pairs").cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
    )


def hashed_features(
    docs: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Signed feature hashing (the "hashing trick", Weinberger et al.
    ICML'09): each token lands in ``md5(token) mod n_buckets`` with a
    ±1 sign drawn from an independent hash bit, and a document's
    sparse feature vector is the per-bucket SUM of signs — the
    fixed-width, vocabulary-free text featurization that needs no
    dictionary build, no vocabulary shuffle, and no retraining when
    new tokens appear (the 100 TB reasons it exists).

    Hashing is md5-based like every stable hash in this repo — bucket
    from the first 28 bits, sign from the 8th hex digit's low bit —
    so any engine reproduces the exact vectors; engine-native hash
    functions are never portable.  The signed sum makes collisions
    cancel in expectation (the unbiasedness argument of the paper).

    Plan: explode → map-side hash exprs → one (doc, bucket) groupBy.
    Zero-weight buckets are kept sparse (dropped), never densified.

    Output: ``id, bucket, w`` (w = signed count, long).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.explode(tokens(text_col)).alias("tok"),
    )
    h = F.md5(F.col("tok"))
    bucket = (
        F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % n_buckets
    )
    sign = F.when(
        F.conv(F.substring(h, 8, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        toks.select("id", bucket.alias("bucket"), sign.alias("s"))
        .groupBy("id", "bucket")
        .agg(F.sum("s").cast("long").alias("w"))
        .filter(F.col("w") != 0)
    )


def rrf_fuse_pair(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    c: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09)
    of two ranked lists: score(d) = Σ_lists 1/(c + rank_d), absent
    list membership contributing 0 — the standard score-free way to
    combine heterogeneous rankers (BM25 × proximity, lexical ×
    vector) without calibrating their score scales.  The N-source,
    multi-query generalization is ``llmdata.similarity.rrf_fuse``;
    this two-frame form keeps the full-outer-join shape for exactly
    two rankers over one query.

    Both inputs are top-k lists by contract, so the fusion frame is
    ≤ |A|+|B| rows — the full-outer join and the final rank window
    are bounded no matter the corpus size; all heavy lifting stays
    inside the upstream rankers.  Each contribution is ONE IEEE
    division of exact inputs and the sum has a fixed operand order,
    so fused scores (and therefore ranks, tie-broken by id) are
    engine-reproducible.

    Output: ``id_col, rank_a, rank_b, rrf_score, rank`` for the
    fused top-``topk``.
    """
    ra = ranked_a.select(
        F.col(id_col), F.col(rank_col).cast("int").alias("rank_a")
    )
    rb = ranked_b.select(
        F.col(id_col), F.col(rank_col).cast("int").alias("rank_b")
    )
    j = ra.join(rb, id_col, "full_outer")

    def contrib(col: str) -> Column:
        return F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(col).cast("double")),
            F.lit(0.0),
        )

    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        j.withColumn("rrf_score", contrib("rank_a") + contrib("rank_b"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
    )


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Reverse search (percolator): match documents against STORED
    conjunctive keyword queries — the alerting/routing primitive
    (saved searches, topic taps on an ingest firehose) where the
    queries are the index and the documents are the probes.

    A document matches a query iff its distinct token set contains
    every query term.  Evaluated as containment-by-counting: explode
    query terms, equi-join on the term, and a (doc, query) pair
    matches when its hit count equals the query's term count —
    one keyed join, no per-query scans, so adding the 10 000th stored
    query costs rows in a dimension table, not another pass over the
    corpus.  Queries with duplicate terms are deduped up front.

    Contract for degenerate queries: a stored query whose ``terms``
    array is EMPTY (or NULL) matches NOTHING — it produces no rows
    from the term explode, so it never appears in the output.  This
    deliberately diverges from the "empty conjunction matches
    everything" convention, which would cross-join the whole corpus
    to every degenerate query; callers that want match-all semantics
    must handle empty queries upstream.  The filter below makes the
    exclusion explicit rather than an accident of explode.

    Returns ``{id_col}, {query_id_col}`` match pairs.
    """
    queries = queries.filter(
        F.col(terms_col).isNotNull() & (F.size(terms_col) >= 1)
    )
    q = queries.select(
        query_id_col,
        F.explode(F.array_distinct(F.col(terms_col))).alias("t"),
    )
    qn = q.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("__n_terms")
    )
    d = docs.select(
        id_col,
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t"),
    )
    hits = (
        d.join(q, "t")
        .groupBy(id_col, query_id_col)
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    return (
        hits.join(qn, query_id_col)
        .filter(F.col("__hits") == F.col("__n_terms"))
        .select(id_col, query_id_col)
    )


def vocab_coverage_curve(
    docs: DataFrame,
    vocab_sizes: list[int],
    text_col: str = "text",
) -> DataFrame:
    """OOV-rate-vs-vocab-size curve — the tokenizer-design trade-off.

    For each candidate vocabulary size *k* (vocab = the *k* most
    frequent corpus terms, ties by ascending term so the cut is
    deterministic): what share of token OCCURRENCES falls outside it?
    The curve decides vocabulary budgets the way the percentile grid
    decides drift thresholds — from the corpus itself.

    One term-frequency aggregate, one global rank over the DISTINCT
    term frame (``global_rank``'s range-repartition plan — the frame
    is |vocab|, not |corpus|), then one filtered aggregate per
    candidate size (no cumulative global window — each k sums the
    rank-≤-k frequencies directly, fully partial-aggregated).
    ``oov_rate`` is the single terminal division per row.

    Returns per size: ``vocab_size, covered_tokens, total_tokens,
    oov_rate``.
    """
    from db_factfinder_spark.operators.ranking import global_rank

    tf = (
        docs.select(
            F.explode(tokens(F.col(text_col))).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = global_rank(
        tf.select((-F.col("freq")).alias("negfreq"), "t", "freq"),
        ["negfreq", "t"],
    )
    tot = tf.agg(F.sum("freq").alias("total_tokens"))
    out = None
    for k in vocab_sizes:
        at_k = (
            ranked.filter(F.col("rank") <= k)
            .agg(F.coalesce(F.sum("freq"), F.lit(0)).alias("covered"))
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(k).alias("vocab_size"),
                F.col("covered").alias("covered_tokens"),
                "total_tokens",
                (
                    (F.col("total_tokens") - F.col("covered"))
                    / F.col("total_tokens")
                ).alias("oov_rate"),
            )
        )
        out = at_k if out is None else out.unionByName(at_k)
    return out


def char_entropy(
    text: Column | str, quantize: int | None = None
) -> Column:
    """Shannon entropy (nats) of the normalized character distribution
    — the cheap compressibility proxy quality filters use to catch
    keyboard-mash, base64 blobs, and single-char padding (low entropy)
    or uniform noise (max entropy) without running a compressor.

    Pure per-row expressions: the normalized alphabet is ≤ 37 symbols
    (a-z, 0-9, space), so the distinct-symbol scan is a BOUNDED
    ``transform`` over the sorted distinct chars — O(37·len) per row,
    map-side, no shuffle, no UDF.  Empty/NULL-normalized text → NULL.

    ``quantize=None`` returns the double entropy with terms folded in
    sorted-symbol order — reproducible within ONE engine, but libm's
    ``ln`` is only within-1-ulp and JVM vs DuckDB disagree on ~5% of
    real inputs, so the double form is NOT cross-engine exact.
    ``quantize=k`` applies the engine's portable-exactness idiom
    (see ``adamic_adar``/``grouped_linreg``): each term is quantized
    to integer ``floor(term·k + 0.5)`` units and summed as longs —
    order-independent and oracle-exact; report ``units / k``.
    """
    t = normalize_text(text)

    def over_chars(chars: Column) -> Column:
        n = F.size(chars).cast("double")
        uniq = F.array_sort(F.array_distinct(chars))
        term = lambda c: (  # noqa: E731
            let(
                F.size(F.filter(chars, lambda x: x == c)).cast("double") / n,
                lambda p: -p * F.log(p),
            )
        )
        if quantize is not None:
            q = lambda c: F.floor(  # noqa: E731
                term(c) * F.lit(float(quantize)) + 0.5
            ).cast("long")
            return F.aggregate(
                F.transform(uniq, q),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        return F.aggregate(
            F.transform(uniq, term),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    chars0 = F.split(t, "")
    return F.when(F.length(t) >= 1, let(chars0, over_chars))


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    by: str | None = None,
    top_ranks: int = 200,
    scale: int = 1_000_000,
) -> DataFrame:
    """Zipf rank–frequency slope per corpus slice: OLS slope of
    ``ln(freq)`` on ``ln(rank)`` over the top ``top_ranks`` tokens —
    natural text sits near −1; templated/generated text and token-soup
    spam drift off, making the slope a corpus-health metric per
    source/snapshot.

    Plan: token counts (one shuffle), per-slice rank window
    (partitioned by the slice key; frame bounded by the slice's
    vocabulary), filter to ``top_ranks``, then ``grouped_linreg`` on
    integer-quantized logs (``floor(ln·scale + 0.5)``) — the engine's
    order-independent exact-sum idiom.  The log itself is
    ``portable_ln`` (libm-free dyadic + atanh series): JVM and DuckDB
    libm ``ln`` disagree by 1 ulp on ~5% of inputs, which flips the
    quantization floor at boundaries — portable_ln computes identical
    BITS in both engines, so the coding carries zero boundary risk.

    ``scale`` defaults to 1e6 (not 1e9) so every OLS cross-product
    stays below 2^63: ``n·Σxy ≤ top_ranks²·(ln r·s)·(ln f·s) ≈ 1e18``
    at s=1e6 — int128→double casts DOUBLE-ROUND in some engines
    (observed: DuckDB HUGEINT→DOUBLE vs Spark's single-rounded
    BigDecimal cast diverge by 1 ulp above 2^63), while every integer
    below 2^63 casts with one correctly-rounded step everywhere.
    Slope resolution at 1e-6 coding is ~1e-6 — far beyond any
    corpus-health use.

    Returns ``{by}, n, slope_u, intercept_u`` from grouped_linreg;
    ``slope = slope_u`` (x and y share the same coding so units
    cancel), ``intercept(nats) = intercept_u / scale``.
    """
    from pyspark.sql import Window

    from db_factfinder_spark.operators.regression import grouped_linreg

    keys = [by] if by else []
    toks = df.filter(F.col(text_col).isNotNull()).select(
        *keys, F.explode(tokens(F.col(text_col))).alias("t")
    )
    counts = toks.groupBy(*keys, "t").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy(*keys).orderBy(F.desc("freq"), F.asc("t"))
    ranked = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_ranks
    )
    from db_factfinder_spark.functions.portable_math import portable_ln

    code = lambda c: F.floor(  # noqa: E731
        portable_ln(c) * F.lit(float(scale)) + 0.5
    ).cast("long")
    if not keys:
        ranked = ranked.withColumn("corpus", F.lit("all"))
        keys = ["corpus"]
    return grouped_linreg(
        ranked, keys, code(F.col("rank")), code(F.col("freq"))
    )


def kneser_ney_bigram(
    docs: DataFrame,
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser–Ney smoothed bigram model — the LM-quality
    upgrade over ``bigram_lm``'s add-one: the backoff weight comes
    from CONTINUATION counts (in how many distinct contexts has w2
    been seen?), which is what makes "san francisco" not leak
    probability to "francisco" after every word.

      P_KN(w2|w1) = max(c(w1w2) − D, 0)/c(w1)
                    + D·N1+(w1,·)/c(w1) · P_cont(w2)
      P_cont(w2)  = N1+(·,w2) / N1+(·,·)

    Everything is integer counts until the terminal divisions
    (op-order mirrored by the oracle); D = 0.75 is exactly
    representable, so ``c − D`` is a single exact IEEE subtraction.

    Plan: one bigram groupBy; N1+(w1,·) and c(w1) ride windows over
    the counts table partitioned by w1 (grouped state, no second
    corpus pass); N1+(·,w2) is one more groupBy on the counts table
    joined back; N1+(·,·) is a one-row broadcast.  The output is the
    observed-bigram table — vocabulary-bounded, broadcastable for
    scoring passes.

    Output: ``w1, w2, c_bigram, c_prev, n1_fw, n1_bw, p_kn``.
    """
    toks = tokens(normalize_text(text_col))
    arr = (
        docs.filter(F.col(text_col).isNotNull())
        .select(toks.alias("ts"))
        .filter(F.size("ts") >= 2)
    )
    pairs = arr.select(
        F.explode(
            F.arrays_zip(
                F.slice("ts", 1, F.size("ts") - 1).alias("w1"),
                F.slice(F.col("ts"), F.lit(2), F.size("ts") - 1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_bigram")
    )
    w1w = Window.partitionBy("w1")
    counts = counts.withColumn("c_prev", F.sum("c_bigram").over(w1w))
    counts = counts.withColumn("n1_fw", F.count(F.lit(1)).over(w1w))
    n1_bw = counts.groupBy("w2").agg(F.count(F.lit(1)).alias("n1_bw"))
    n1_all = counts.agg(F.count(F.lit(1)).alias("n1_all"))
    d = F.lit(float(discount))
    p_kn = (
        F.greatest(F.col("c_bigram").cast("double") - d, F.lit(0.0))
        / F.col("c_prev").cast("double")
        + d
        * F.col("n1_fw").cast("double")
        / F.col("c_prev").cast("double")
        * (F.col("n1_bw").cast("double") / F.col("n1_all").cast("double"))
    )
    return (
        counts.join(n1_bw, "w2")
        .crossJoin(F.broadcast(n1_all))
        .select(
            "w1", "w2", "c_bigram", "c_prev", "n1_fw", "n1_bw",
            p_kn.alias("p_kn"),
        )
    )


def rouge_n_pairs(
    pairs: DataFrame,
    cand_col: str = "cand",
    ref_col: str = "ref",
    id_col: str = "pair_id",
    n: int = 1,
) -> DataFrame:
    """ROUGE-N between paired texts: clipped n-gram MULTISET overlap —
    the standard summary/generation eval, and at corpus scale the
    "how derivative is the candidate of its source" audit for
    synthetic/augmented training data.

      match = Σ_g min(count_cand(g), count_ref(g))
      precision = match/|cand grams|, recall = match/|ref grams|,
      f1 = 2·P·R/(P+R)

    Explode each side's n-grams WITH multiplicity, count per (pair,
    gram), inner-join on (pair, gram), sum the clipped minima — all
    exact integers until the terminal divisions (ROUGE's clipping is
    exactly the multiset intersection).  Pairs with zero matches get
    0.0 scores (left join + coalesce), pairs where either side has no
    n-grams get NULL (undefined, surfaced rather than silently 0).

    Scale: the join key is (pair_id, gram) — co-partitioned, no
    cross-pair work; each pair's cost is its own gram count.

    Output: ``{id_col}, n_cand, n_ref, n_match, precision, recall,
    f1``.
    """

    def grams(col: str) -> Column:
        t = tokens(normalize_text(F.col(col)))
        if n == 1:
            return t
        return let(
            t,
            lambda ts: F.when(
                F.size(ts) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(ts) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )

    base = pairs.select(
        F.col(id_col).alias("pid"),
        grams(cand_col).alias("cg"),
        grams(ref_col).alias("rg"),
    )
    sizes = base.select(
        "pid",
        F.size("cg").alias("n_cand"),
        F.size("rg").alias("n_ref"),
    )
    cc = base.select("pid", F.explode("cg").alias("g")).groupBy(
        "pid", "g"
    ).agg(F.count(F.lit(1)).alias("nc"))
    rc = base.select("pid", F.explode("rg").alias("g")).groupBy(
        "pid", "g"
    ).agg(F.count(F.lit(1)).alias("nr"))
    match = (
        cc.join(rc, ["pid", "g"])
        .groupBy("pid")
        .agg(F.sum(F.least("nc", "nr")).alias("n_match"))
    )
    j = sizes.join(match, "pid", "left").withColumn(
        "n_match", F.coalesce("n_match", F.lit(0))
    )
    p = F.col("n_match").cast("double") / F.col("n_cand").cast("double")
    r = F.col("n_match").cast("double") / F.col("n_ref").cast("double")
    f1 = F.when(
        (p + r) > 0.0, F.lit(2.0) * p * r / (p + r)
    ).otherwise(F.lit(0.0))
    return j.select(
        F.col("pid").alias(id_col),
        "n_cand",
        "n_ref",
        F.col("n_match").cast("long").alias("n_match"),
        F.when(F.col("n_cand") > 0, p).alias("precision"),
        F.when(F.col("n_ref") > 0, r).alias("recall"),
        F.when((F.col("n_cand") > 0) & (F.col("n_ref") > 0), f1).alias("f1"),
    )


def heaps_law_fit(
    docs: DataFrame,
    checkpoints: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Heaps'-law fit V(n) ≈ K·n^β: vocabulary growth vs corpus size,
    the planning curve for tokenizer budgets and dedup payoff (β well
    below the corpus norm ⇒ the new data is mostly old types).

    ``checkpoints`` are explicit ``id_col`` thresholds (ascending);
    checkpoint *t* measures the corpus prefix ``id ≤ t``.  Exact plan
    with NO per-checkpoint corpus pass:

    * tokens at *t*: per-doc token counts, each doc assigned to its
      FIRST covering checkpoint, cumulative over the ≤K bucket rows;
    * types at *t*: each type's FIRST document id (one groupBy — a
      type is "new" exactly once), bucketed and cumulated the same
      way — counting first occurrences is what makes the cumulative
      distinct-count exact without a quadratic distinct-per-prefix.

    The K-row cumulative window is unpartitioned but provably bounded
    by ``len(checkpoints)``.  β comes from ``grouped_linreg`` on
    integer-quantized ``portable_ln`` codes (cross-engine bit-exact;
    see ``zipf_slope`` for the 2^63 scale argument).

    Returns one row: ``n_points, slope_u (β), intercept_u``
    (``K = e^(intercept_u/scale)``).
    """
    from db_factfinder_spark.functions.portable_math import portable_ln
    from db_factfinder_spark.operators.regression import grouped_linreg

    cps = F.array(*[F.lit(int(c)) for c in sorted(checkpoints)])
    bucket_of = lambda idc: F.get(  # noqa: E731 — first covering cp
        F.filter(cps, lambda c: c >= idc), 0
    )
    toks = tokens(normalize_text(F.col(text_col)))
    per_doc = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            bucket_of(F.col(id_col)).alias("cp"),
            F.size(toks).alias("n_toks"),
        )
        .filter(F.col("cp").isNotNull())
        .groupBy("cp")
        .agg(F.sum("n_toks").alias("b_toks"))
    )
    first_doc = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.min("id").alias("first_id"))
    )
    per_type = (
        first_doc.select(bucket_of(F.col("first_id")).alias("cp"))
        .filter(F.col("cp").isNotNull())
        .groupBy("cp")
        .agg(F.count(F.lit(1)).alias("b_types"))
    )
    w = Window.orderBy("cp").rowsBetween(Window.unboundedPreceding, 0)
    points = (
        per_doc.join(per_type, "cp", "full")
        .select(
            "cp",
            F.coalesce("b_toks", F.lit(0)).alias("b_toks"),
            F.coalesce("b_types", F.lit(0)).alias("b_types"),
        )
        .withColumn("cum_toks", F.sum("b_toks").over(w))
        .withColumn("cum_types", F.sum("b_types").over(w))
        .filter((F.col("cum_toks") >= 1) & (F.col("cum_types") >= 1))
        .withColumn("corpus", F.lit("all"))
    )
    code = lambda c: F.floor(  # noqa: E731
        portable_ln(c) * F.lit(float(scale)) + 0.5
    ).cast("long")
    return grouped_linreg(
        points, ["corpus"], code(F.col("cum_toks")), code(F.col("cum_types"))
    ).select(
        F.col("n").alias("n_points"), "slope_u", "intercept_u"
    )


def bigram_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: DataFrame | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document cross-entropy (nats/bigram) under the corpus
    add-one bigram LM — the Gopher/CCNet-style "does this read like
    the corpus" quality filter.  High values flag token soup,
    boilerplate grids and wrong-language content; the LM is
    ``bigram_lm``'s (c+1)/(c_prev+V), trained on the same corpus
    unless a ``model`` frame (w1, w2, c_bigram, c_prev, vocab) is
    supplied (train-on-reference, score-everything — the production
    split).

    Exactness: −ln P = ln(c_prev+V) − ln(c+1) — ``portable_ln`` on
    INTEGERS per bigram (bit-exact cross-engine), quantized to units
    and integer-summed per document (order-independent), ONE terminal
    division for nats/bigram.  Unseen bigrams (novel w1w2 with seen
    w1) and unseen contexts both fall back to the add-one floor via a
    left join + per-context/global defaults.

    Plan: docs explode to (doc, w1, w2) with multiplicity; one keyed
    join to the broadcast-size model table; per-doc integer sum.
    Returns ``{id_col}, n_bigrams, nll_units, nats_per_bigram``.
    """
    from db_factfinder_spark.functions.portable_math import portable_ln

    if model is None:
        model = bigram_lm(docs, text_col)
    toks = tokens(normalize_text(text_col))
    arr = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), toks.alias("ts"))
        .filter(F.size("ts") >= 2)
    )
    pairs = arr.select(
        "id",
        F.explode(
            F.arrays_zip(
                F.slice("ts", 1, F.size("ts") - 1).alias("w1"),
                F.slice(F.col("ts"), F.lit(2), F.size("ts") - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # per-context stats (c_prev is constant per w1; vocab global) for
    # the unseen-bigram fallback: P = 1/(c_prev+V); unseen context:
    # P = 1/V
    ctx = model.groupBy("w1").agg(
        F.max("c_prev").alias("ctx_prev"), F.max("vocab").alias("v1")
    )
    vocab = model.agg(F.max("vocab").alias("v"))
    j = (
        pairs.join(
            model.select("w1", "w2", "c_bigram", "c_prev"),
            ["w1", "w2"],
            "left",
        )
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    den = F.coalesce(
        F.col("c_prev") + F.col("v"),      # seen bigram
        F.col("ctx_prev") + F.col("v"),    # seen context, novel w2
        F.col("v"),                        # novel context: 0 + V
    )
    num = F.coalesce(F.col("c_bigram"), F.lit(0)) + 1
    nll = portable_ln(den) - portable_ln(num)
    units = F.floor(nll * F.lit(float(scale)) + 0.5).cast("long")
    per = j.groupBy(F.col("id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(units).alias("nll_units"),
    )
    return per.select(
        id_col,
        "n_bigrams",
        "nll_units",
        (
            F.col("nll_units").cast("double")
            / F.col("n_bigrams").cast("double")
            / F.lit(float(scale))
        ).alias("nats_per_bigram"),
    )


def percolate_with_negation(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    exclude_col: str = "exclude_terms",
) -> DataFrame:
    """Percolator with MUST-NOT terms: a document matches a stored
    query iff it contains every term of ``terms_col`` AND none of
    ``exclude_col`` — the alerting shape real saved searches need
    ("kubernetes AND NOT helm").

    Positives evaluate by containment-counting (the :func:`percolate`
    plan); negatives are ONE anti-join on the exploded exclude terms
    — a (doc, query) pair that hits any exclude term is removed.
    NULL/empty exclude lists exclude nothing; empty/NULL positive
    terms match nothing (same explicit contract as ``percolate``).

    Returns ``{id_col}, {query_id_col}`` match pairs.
    """
    pos = percolate(
        docs, queries, id_col, text_col, query_id_col, terms_col
    )
    ex = queries.filter(
        F.col(exclude_col).isNotNull() & (F.size(exclude_col) >= 1)
    ).select(
        query_id_col,
        F.explode(F.array_distinct(F.col(exclude_col))).alias("t"),
    )
    d = docs.select(
        id_col,
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t"),
    )
    hits_ex = d.join(ex, "t").select(id_col, query_id_col).distinct()
    return pos.join(hits_ex, [id_col, query_id_col], "left_anti")


def hashed_linear_score(
    df: DataFrame,
    weights: DataFrame,
    dim: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Linear text classifier over hashed bag-of-words features — the
    fastText / Vowpal-Wabbit serving shape: token → hash bucket (mod
    ``dim``) → weight lookup → per-document sum, logit = Σw / n_tokens.
    The standard cheap quality/topic filter in front of a training-data
    pipeline once a model has been trained offline.

    ``weights`` is the model: ``(bucket BIGINT, w BIGINT)``, broadcast
    — at any corpus size the model rides along to every executor and
    the corpus never shuffles for the lookup.  Weights are INTEGER
    (fixed-point, trainer's choice of scale): the per-document sum
    accumulates longs, so the score is order-independent and exact;
    only the final mean divides.  Buckets absent from the model (OOV /
    pruned) contribute 0, like a sparse model file.

    Scale shape: explode to token grain → broadcast-join the model →
    partial-sum map-side → one shuffle at document grain.  The hash is
    the first 60 bits of md5, portable across engines.

    Output: ``id_col, n_toks, feat_sum, logit`` (logit NULL for
    token-less documents).
    """
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("tok")
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long"),
        F.lit(dim).cast("long"),
    )
    hashed = toks.withColumn(
        "bucket", F.when(F.col("tok").isNotNull(), bucket)
    )
    joined = hashed.join(F.broadcast(weights), "bucket", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum(F.col("tok").isNotNull().cast("long")).alias("n_toks"),
            F.sum(
                F.coalesce(F.col("w").cast("long"), F.lit(0).cast("long"))
            ).alias("feat_sum"),
        )
        .select(
            id_col,
            "n_toks",
            "feat_sum",
            F.try_divide(
                F.col("feat_sum").cast("double"),
                F.when(F.col("n_toks") > 0, F.col("n_toks")).cast("double"),
            ).alias("logit"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Marginal-novelty curve over an ordered corpus: for each document
    (in ``id_col`` ingestion order), the fraction of its distinct word
    ``n``-grams never seen in ANY earlier document.  The curation
    signal behind "is this source still adding new content or are we
    re-crawling the same text" — novelty decays toward 0 as a crawl
    saturates, and per-source novelty curves rank sources by marginal
    value per ingested byte.

    Set-based, order-free formulation: a gram's first appearance is
    ``min(doc id)`` over its posting list, so a doc's novel grams are
    exactly those whose min-id equals the doc — two partial-agg
    shuffles at gram grain (min, then the per-doc count), no window
    over the whole corpus, no iteration.  Hot grams (boilerplate) are
    min-reduced map-side, so a gram appearing in every document costs
    one row per partition, not a skewed reduce.

    Output: ``id_col, n_grams, n_novel, novelty`` (novelty NULL when
    the doc has no grams; first doc of the corpus scores 1.0).
    """
    from db_factfinder_spark.llmdata.dedup import shingles

    grams = df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("gram")
    )
    first = grams.groupBy("gram").agg(F.min(id_col).alias("first_id"))
    tagged = grams.join(first, "gram")
    per_doc = tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(
            (F.col("first_id") == F.col(id_col)).cast("long")
        ).alias("n_novel"),
    )
    base = df.select(id_col)
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_grams"), F.lit(0).cast("long")).alias("n_grams"),
        F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias("n_novel"),
        F.try_divide(
            F.col("n_novel").cast("double"), F.col("n_grams").cast("double")
        ).alias("novelty"),
    )


def build_gram_state(
    df: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Distinct word ``n``-gram set of a corpus — the persisted state
    ``ngram_novelty_with_state`` scores new batches against (persist
    it as Parquet between ingestion runs, like ``CorpusDedupState``).
    One column: ``gram``."""
    from db_factfinder_spark.llmdata.dedup import shingles

    return (
        df.select(F.explode(shingles(text_col, n)).alias("gram")).distinct()
    )


def ngram_novelty_with_state(
    df: DataFrame,
    state_grams: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental ``ngram_novelty``: a gram is novel only if it is
    absent from the persisted corpus state AND this doc is its first
    appearance (min id) within the batch.  The delta-only scoring
    pattern of ``admit_new_documents`` applied to the novelty curve —
    a nightly ingest scores against yesterday's state instead of
    re-shingling the whole corpus.

    Scale shape: the batch's gram table anti-joins the state at gram
    grain (at 100 TB, pre-prune with a Bloom filter of the state —
    ``bloom_prune`` — so only probable-new grams shuffle), then the
    same two partial aggs as the batch-local novelty.  ``n_grams``
    still counts ALL of the doc's distinct grams, so novelty is
    comparable across runs.

    Output: ``id_col, n_grams, n_novel, novelty`` (novelty NULL for
    gram-less docs)."""
    from db_factfinder_spark.llmdata.dedup import shingles

    grams = df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("gram")
    )
    fresh = grams.join(
        state_grams.select("gram").distinct(), "gram", "left_anti"
    )
    first = fresh.groupBy("gram").agg(F.min(id_col).alias("first_id"))
    novel = (
        fresh.join(first, "gram")
        .filter(F.col("first_id") == F.col(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    totals = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(novel, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0).cast("long")).alias(
                "n_grams"
            ),
            F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias(
                "n_novel"
            ),
            F.try_divide(
                F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).cast(
                    "double"
                ),
                F.col("n_grams").cast("double"),
            ).alias("novelty"),
        )
    )
