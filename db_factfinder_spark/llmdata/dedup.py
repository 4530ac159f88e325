"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design
------------
* **Exact** is one hash aggregation on a content fingerprint — a single
  shuffle on the hash key, no pairwise work, trivially 100 TB-safe.
* **Jaccard pairs** is the exact-but-quadratic baseline: explode
  shingles, equi-join on shingle, count per pair.  Correct at any
  scale *only* for bounded shingle fan-out; it exists as the oracle
  the LSH path is validated against.
* **MinHash+LSH** is the scale path: signatures are per-row column
  expressions (one md5-derived hash per shingle, k affine slot
  transforms), banding groups rows by
  (band_id, band_hash) so the only join is within small buckets —
  candidate pairs, never all-pairs.  Hot buckets (boilerplate shingles)
  are the skew risk; cap bucket size upstream or salt.
* **SimHash** gives a 64-bit bit-parallel fingerprint; near-dup lookup
  is a join on rotated prefix buckets + Hamming filter.

All hashing is md5-based (not Spark's xxhash/murmur) so every result is
reproducible in any engine — the DuckDB oracle computes the identical
signatures.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# one-time marker that a default-on bucket cap is in effect (see
# cap_hot_buckets) — plan-level, since actual drops are data-dependent
_CAP_LOGGED = False

from db_factfinder_spark.functions.expr import let
from db_factfinder_spark.llmdata.checkpointing import materialize
from db_factfinder_spark.llmdata.textstats import fingerprint, normalize_text, tokens


def cap_hot_buckets(
    df: DataFrame, key_cols: list[str], max_bucket: int | None
) -> DataFrame:
    """Drop every row of a bucket larger than ``max_bucket`` before the
    within-bucket self-join.

    An LSH bucket with m members emits O(m²) pairs inside ONE reduce
    task: at 100 TB a boilerplate bucket (millions of near-identical
    license headers / navigation chrome) turns into a task that never
    finishes.  A bucket that hot carries no near-dup signal anyway —
    its members are either byte-identical (exact_dedup's job, run it
    first) or boilerplate noise — so the standard fix is to drop the
    bucket wholesale rather than salt it.

    Cost: one window count partitioned by the bucket key — the same key
    the self-join shuffles on, so AQE/exchange-reuse keeps it to one
    extra pass, no extra all-to-all.  ``max_bucket=None`` disables.

    A one-time (per-process) log line marks the plan as CAPPED so a
    caller on the default cap can tell a lower-bound result from an
    exact one without reading the docstring; whether the cap actually
    dropped rows is data-dependent and only knowable at action time,
    so the marker is plan-level by design."""
    if max_bucket is None:
        return df
    global _CAP_LOGGED
    if not _CAP_LOGGED:
        _CAP_LOGGED = True
        import logging

        logging.getLogger(__name__).info(
            "cap_hot_buckets: bucket cap %d is active on %s — results "
            "are a SUBSET of the exact pair set if any bucket exceeds "
            "the cap; pass max_*=None for exact semantics",
            max_bucket,
            key_cols,
        )
    w = Window.partitionBy(*key_cols)
    return (
        df.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("__bucket_n") <= max_bucket)
        .drop("__bucket_n")
    )


def min_count_for_ratio(n: Column, threshold: float) -> Column:
    """Smallest integer ``c`` with ``(c / n) as double >= threshold`` —
    the EXACT comparison every verify stage runs, so any integer bound
    derived from it can never disagree with the verification filter.

    The naive ``ceil(threshold * n)`` computes the float PRODUCT, which
    for adversarial (threshold, n) pairs crosses an integer differently
    than the correctly-rounded DIVISION the verify stage evaluates
    (e.g. threshold=0.07, n=100: 0.07*100 = 7.000000000000001 in
    binary64, so ceil gives 8, yet 7/100 = 0.07 >= 0.07 — the true
    minimum is 7).  A prefix length derived from the inflated bound is
    one shingle short and a true boundary pair silently generates no
    candidate.  The fix probes c0±1 around the float ceil with the
    division itself, repairing both rounding directions.

    Shared by ``prefix_filter_pairs`` and ``containment_pairs`` (and
    any future count-vs-ratio bound); audited by
    ``tests/test_dedup.py`` against a brute-force sweep."""
    c0 = F.ceil(F.lit(threshold) * n).cast("int")
    nd = n.cast("double")
    return (
        F.when((c0 - 1).cast("double") / nd >= F.lit(threshold), c0 - 1)
        .when(c0.cast("double") / nd >= F.lit(threshold), c0)
        .otherwise(c0 + 1)
    )


def max_count_for_ratio(n: Column, threshold: float) -> Column:
    """Largest integer ``c`` with ``(c / n) as double <= threshold`` —
    the complement of :func:`min_count_for_ratio`, for "drop at most a
    ``threshold`` fraction" bounds (trimming, truncation budgets).
    Same float-ceil/floor hazard, same ±1 probe repair around the raw
    float product; audited by the same brute-force sweep."""
    c0 = F.floor(F.lit(threshold) * n).cast("int")
    nd = n.cast("double")
    return (
        F.when((c0 + 1).cast("double") / nd <= F.lit(threshold), c0 + 1)
        .when(c0.cast("double") / nd <= F.lit(threshold), c0)
        .otherwise(c0 - 1)
    )


def _md5_long(c: Column) -> Column:
    """First 15 hex chars of md5 as a non-negative bigint (60 bits) —
    portable: DuckDB `('0x' || substr(md5(x),1,15))::BIGINT` matches."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# MinHash slot hashing: ONE 28-bit md5 prefix per shingle, then
# `num_hashes` affine transforms (a·h + b) mod P — the standard
# universal-hash minhash family.  28-bit h keeps a·h ≤ 2^59 (no int64
# overflow in any engine); P = 2^31−1 (Mersenne prime) > 2^28 keeps the
# affine map injective-ish over the hash domain.  Replaces the previous
# md5-per-slot scheme (k md5 calls per shingle → one) — measured ~2×
# on the signature stage at equal recall.
_MH_P = 2_147_483_647


def _mh_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per slot, reproducible in any engine (the
    DuckDB oracle embeds the same constants as literals)."""
    import hashlib

    out = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"mh-a|{i}".encode()).hexdigest()[:8], 16) % (
            _MH_P - 1
        ) + 1
        b = int(hashlib.md5(f"mh-b|{i}".encode()).hexdigest()[:8], 16) % _MH_P
        out.append((a, b))
    return out


def _md5_long28(c: Column) -> Column:
    """First 7 hex chars of md5 as a 28-bit bigint — portable: DuckDB
    `('0x' || substr(md5(x),1,7))::BIGINT` matches."""
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


# ---------------------------------------------------------------- exact
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each identical (normalized)
    document.  One shuffle on the fingerprint.

    NULL-text documents have no content fingerprint; they must NOT
    collapse into one NULL group (grouping would silently mark every
    missing-text record a copy of the others), so each gets a unique
    per-id sentinel key and survives as its own group."""
    fp = F.coalesce(
        fingerprint(text_col),
        F.concat(F.lit("null:"), F.col(id_col).cast("string")),
    )
    return (
        df.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .withColumnRenamed("__fp", "fingerprint")
    )


# ------------------------------------------------------------- shingles
def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), from normalized tokens.

    The token array is let-bound so the per-shingle lambda slices a
    materialized value — capturing the tokenize expression directly
    would re-run normalize+split once per shingle (O(k) tokenizations
    per row; measured 20× slower)."""

    def build(toks: Column) -> Column:
        k = F.size(toks) - (n - 1)
        # guard: sequence(1, 0) would generate a *descending* [1, 0]
        return F.when(k >= 1, F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )).otherwise(F.array().cast("array<string>"))

    return let(tokens(normalize_text(text)), build)


def _shingle_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    checkpoint_mode: str,
    max_df: int | None,
) -> DataFrame:
    """The shared candidate-pair spine behind jaccard_pairs and
    dedup_yield_curve: shingle once (materialized — the self-join
    would re-run the pipeline on both sides), optional ``max_df``
    hot-shingle guard (the cap_hot_buckets subset contract), a<b
    equi-join, per-pair intersection count.  Returns
    ``id_a, id_b, n_a, n_b, n_common``."""
    sh = materialize(
        df.select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh"))
        .withColumn("n_sh", F.size("sh")),
        checkpoint_mode,
    )
    exploded = sh.select("id", "n_sh", F.explode("sh").alias("g"))
    if max_df is not None:
        # Window-count partitioned by the same key the self-join
        # shuffles on (exchange reuse — one extra pass, no extra
        # all-to-all), mirroring cap_hot_buckets.
        wg = Window.partitionBy("g")
        exploded = (
            exploded.withColumn("__df_g", F.count(F.lit(1)).over(wg))
            .filter(F.col("__df_g") <= max_df)
            .drop("__df_g")
        )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    checkpoint_mode: str = "local",
    max_df: int | None = None,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard ≥ threshold.
    Explode → equi-join on shingle → per-pair intersection count →
    |A∪B| = |A|+|B|−|A∩B|.  The a<b guard halves the join output.

    ``max_df`` is the hot-shingle guard (the exact-join twin of
    ``cap_hot_buckets``): a shingle shared by m documents produces m²
    join rows inside one reduce task — one boilerplate shingle
    (license header, navigation chrome) across 10⁶ docs is a task
    that never finishes.  With ``max_df=k``, shingles whose document
    frequency exceeds k are dropped from the POSTINGS before the
    self-join.  Contract (same as cap_hot_buckets): the capped result
    is a SUBSET of the exact answer — n_a/n_b stay the full set
    sizes, only n_common can shrink, so every computed jaccard is an
    underestimate and the filter only gets stricter; no spurious pair
    can appear.  ``max_df=None`` (default) is the exact oracle mode.
    For exact answers WITH bounded candidates use
    ``prefix_filter_pairs`` — q111 proves it yields the identical
    answer with the megabuckets never entering the index."""
    # Materialize the shingled frame once: the self-join would otherwise
    # re-run the whole tokenize→shingle pipeline on BOTH sides (Spark
    # reuses no exchange across differently-projected self-join sides).
    # At cluster scale this is the same call a production near-dup job
    # makes before pair generation — shingle once, reuse many times.
    pairs = _shingle_candidate_pairs(
        df, text_col, id_col, n, checkpoint_mode, max_df
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_yield_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    thresholds_x20: tuple[int, ...] = (10, 12, 14, 16, 18, 19),
    checkpoint_mode: str = "local",
    max_df: int | None = None,
) -> DataFrame:
    """Dedup threshold-sweep report: for each candidate Jaccard
    threshold t = k/20, how many near-dup pairs fire and how many
    documents are touched — the yield curve a curation team reads
    BEFORE committing a 100 TB corpus to one threshold (rerunning the
    pair join per candidate threshold would pay the shuffle per
    point; this computes the whole curve from ONE pair pass).

    Exactness: the threshold test is the integer cross-multiplication
    ``20·n_common ≥ k·(n_a+n_b−n_common)`` — no float enters any
    decision, so the curve is bit-stable at every boundary.

    Plan: the jaccard_pairs candidate join once (same ``max_df``
    hot-shingle guard and subset contract), then a broadcast of the
    ≤ |thresholds| grid; the per-threshold doc count pre-aggregates
    on (threshold, doc) before counting, so both aggregates keep
    map-side partials.  Output: ``t_num, threshold, n_pairs_ge,
    n_docs_ge`` per threshold.
    """
    pairs = _shingle_candidate_pairs(
        df, text_col, id_col, n, checkpoint_mode, max_df
    )
    spark = df.sparkSession
    grid = spark.createDataFrame(
        [(int(k),) for k in thresholds_x20], "t_num int"
    )
    fired = pairs.join(F.broadcast(grid)).filter(
        F.lit(20) * F.col("n_common")
        >= F.col("t_num")
        * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    )
    n_pairs = fired.groupBy("t_num").agg(
        F.count(F.lit(1)).alias("n_pairs_ge")
    )
    n_docs = (
        fired.select(
            "t_num", F.explode(F.array("id_a", "id_b")).alias("id")
        )
        .groupBy("t_num", "id")
        .agg(F.lit(1).alias("_one"))
        .groupBy("t_num")
        .agg(F.count(F.lit(1)).alias("n_docs_ge"))
    )
    return (
        grid.join(n_pairs, "t_num", "left")
        .join(n_docs, "t_num", "left")
        .select(
            "t_num",
            (F.col("t_num").cast("double") / F.lit(20.0)).alias(
                "threshold"
            ),
            F.coalesce("n_pairs_ge", F.lit(0)).cast("long").alias(
                "n_pairs_ge"
            ),
            F.coalesce("n_docs_ge", F.lit(0)).cast("long").alias(
                "n_docs_ge"
            ),
        )
    )


# -------------------------------------------------------------- minhash
def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    n: int = 3,
) -> DataFrame:
    """MinHash signature per document: slot i = min over shingles of
    (aᵢ·md5₂₈(shingle) + bᵢ) mod P — one md5 per shingle, k affine
    transforms (see ``_mh_params``).  Pure per-row expressions — no
    shuffle.

    All slots fold in ONE pass over the per-shingle hash array
    (element-wise ``least`` on a k-vector accumulator) so the
    tokenize→normalize→shingle→md5 pipeline is evaluated once per row,
    not once per slot — k separate ``array_min`` expressions would
    blow up the codegen tree k-fold; the shingle array itself is
    let-bound so its tokenize→shingle pipeline runs once, not once for
    the fold plus once for the size check."""
    sized = df.select(
        F.col(id_col).alias("id"),
        let(shingles(text_col, n), _minhash_fold(num_hashes)).alias("sig"),
    )
    slots = [F.get("sig", i).alias(f"mh_{i}") for i in range(num_hashes)]
    return sized.select("id", *slots)


def _minhash_fold(num_hashes: int):
    """Column→Column fold: shingle array → `num_hashes`-slot signature
    array (NULL for shingle-less docs).  The caller decides whether the
    input is a let-bound expression (inline path) or a materialized
    column (pre-shingled path)."""
    sentinel = F.array(*[F.lit(1 << 62).cast("long") for _ in range(num_hashes)])
    params = _mh_params(num_hashes)

    def fold(sh: Column) -> Column:
        hs = F.transform(sh, _md5_long28)
        sig = F.aggregate(
            hs,
            sentinel,
            lambda acc, h: F.zip_with(
                acc,
                F.array(
                    *[
                        (F.lit(a) * h + F.lit(b)) % F.lit(_MH_P)
                        for a, b in params
                    ]
                ),
                lambda x, y: F.least(x, y),
            ),
        )
        return F.when(F.size(sh) > 0, sig)

    return fold


def band_key_frame(
    signatures: DataFrame,
    num_hashes: int,
    bands: int,
    max_bucket: int | None,
) -> DataFrame:
    """Exploded ``(id, band, bucket)`` band keys from a wide ``mh_*``
    signature frame — the candidate-generation key shared by the
    self-dedup pair join and the cross-corpus decontamination join.

    Shingle-less docs carry an all-NULL signature; concat_ws skips
    NULLs, so without the mh_0 null gate they would all hash to
    md5("") and share every band bucket — an O(m²) hot-bucket blowup
    of bogus pairs among m empty/short docs.  The gate lives INSIDE
    the generator (explode of a NULL array emits no rows) rather than
    as a .filter(): a Filter node's predicate gets substituted through
    the projection and pushed below the repartition into the parquet
    scan, re-running the whole signature fold serially on the raw
    (possibly single-split) input — measured 2× the entire stage cost.
    """
    rows = num_hashes // bands
    assert rows * bands == num_hashes, "bands must divide num_hashes"
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    exploded = signatures.select(
        "id",
        F.explode(
            F.when(F.col("mh_0").isNotNull(), band_structs)
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    return cap_hot_buckets(exploded, ["band", "bucket"], max_bucket)


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Band the signature (rows = num_hashes/bands), bucket on
    (band_id, band_hash), emit candidate pairs per bucket.  Matching
    any band ⇒ candidate.  The union-of-bands is a single exploded
    frame, so the whole operator is one shuffle on the bucket key.

    ``max_bucket`` guards the O(m²) within-bucket blowup (see
    ``cap_hot_buckets``); the default is far above any bucket a
    deduplicated corpus produces but bounds the damage of boilerplate
    floods.  A capped result is a *subset* of the uncapped one — any
    exact external oracle must run uncapped (``max_bucket=None``) or
    model the cap."""
    exploded = band_key_frame(signatures, num_hashes, bands, max_bucket)
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    n: int = 3,
    verify_threshold: float | None = 0.8,
    max_bucket: int | None = 10_000,
    checkpoint_mode: str = "local",
    shingle_fn=None,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → (optional)
    exact-Jaccard verification of only the candidates.

    The shingled frame is materialized ONCE (per ``checkpoint_mode``,
    see ``llmdata.checkpointing``) and
    feeds all three consumers — the signature fold and both verify
    sides.  Inline, the tokenize→shingle pipeline would run 3× over
    the full corpus (self-join sides share no exchange).

    ``shingle_fn`` (Column → Column array<string>) swaps the shingle
    basis — e.g. ``char_shingles`` for space-free scripts; every
    downstream stage (minhash fold, banding, Jaccard verify) is
    representation-agnostic.  Default: word ``shingles(·, n)``."""
    if shingle_fn is None:
        shingle_fn = lambda c: shingles(c, n)  # noqa: E731
    if verify_threshold is None:
        sigs = minhash_signatures(df, text_col, id_col, num_hashes, n)
        return lsh_candidate_pairs(sigs, num_hashes, bands, max_bucket)
    sh = materialize(
        df.select(
            F.col(id_col).alias("id"),
            shingle_fn(F.col(text_col)).alias("sh"),
        ),
        checkpoint_mode,
    )
    sigs = sh.select(
        "id", _minhash_fold(num_hashes)(F.col("sh")).alias("sig")
    ).select(
        "id", *[F.get("sig", i).alias(f"mh_{i}") for i in range(num_hashes)]
    )
    cands = lsh_candidate_pairs(sigs, num_hashes, bands, max_bucket)
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = cands.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (
        joined.withColumn("jaccard", F.try_divide(inter, union))
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------- simhash
def simhash(text: Column | str, bits: int = 32) -> Column:
    """Charikar SimHash fingerprint: each token votes ±1 on `bits` bit
    positions of its md5-derived hash; the sign vector packs into a
    long.  Bit-parallel: one expression per document, no explode.

    Token-less documents (empty/NULL/symbol-only text) return NULL —
    an all-zero fingerprint would make every contentless doc a
    hamming-0 "near-duplicate" of every other one.

    ``bits`` is capped at 60: token hashes are 60-bit md5 prefixes, so
    higher vote bits could never be set anyway — and 2^63 would
    overflow the packed long (the old pow()-based mask clamped to
    Long.MaxValue at bit 63, corrupting fingerprints)."""
    assert 1 <= bits <= 60, "simhash supports 1..60 bits (60-bit token hashes)"

    def bit_value(b):  # 2^b as a long; exact for b ≤ 62 (bits ≤ 60)
        return F.pow(F.lit(2.0), b.cast("double")).cast("long")

    def pack(hashes: Column) -> Column:
        # per-bit vote: sum over tokens of (bit set ? +1 : -1), all
        # `bits` counters folded in ONE pass over the token hashes (a
        # bit-indexed vector accumulator) — per-bit aggregates would
        # re-iterate the hash array `bits` times.  Integer sums are
        # order-independent, so the votes (and the fingerprint) are
        # identical either way.  `hashes` is a let-bound value — the
        # md5 transform runs once, not once per reference.
        zeros = F.array_repeat(F.lit(0), bits)
        votes = F.aggregate(
            hashes,
            zeros,
            lambda acc, h: F.zip_with(
                acc,
                F.transform(
                    F.sequence(F.lit(0), F.lit(bits - 1)),
                    lambda b: F.when(
                        h.bitwiseAND(bit_value(b)) != 0, 1
                    ).otherwise(-1),
                ),
                lambda a, v: a + v,
            ),
        )
        # pack sign bits: bit b set iff vote > 0
        return F.aggregate(
            F.zip_with(
                votes,
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda v, b: F.when(v > 0, bit_value(b)).otherwise(
                    F.lit(0).cast("long")
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc.bitwiseOR(x),
        )

    toks = F.array_distinct(tokens(normalize_text(text)))
    return let(
        toks,
        lambda t: F.when(F.size(t) > 0, let(F.transform(t, _md5_long), pack)),
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    prefix_bits: int = 8,
    max_bucket: int | None = 10_000,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on the fingerprint's top
    `prefix_bits` (cheap LSH), then Hamming-filter within buckets.
    For guaranteed recall at distance d, use d+1 rotated prefix
    tables (``simhash_multiprobe_pairs``); one prefix table is the
    throughput-oriented variant.  ``max_bucket`` drops prefix buckets
    too hot to pair-join (see ``cap_hot_buckets``)."""
    # materialized once — the self-join would re-run the full simhash
    # pipeline (tokenize → md5 → vote fold) on both sides otherwise
    sh = materialize(
        df.select(
            F.col(id_col).alias("id"), simhash(text_col, bits).alias("sig")
        ).withColumn("bucket", F.shiftright("sig", bits - prefix_bits)),
        checkpoint_mode,
    )
    sh = cap_hot_buckets(sh.filter(F.col("sig").isNotNull()), ["bucket"], max_bucket)
    a, b = sh.alias("a"), sh.alias("b")
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "hamming"
        )
    )


def simhash_multiprobe_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Guaranteed-recall SimHash near-dup pairs via d+1 blocked prefix
    tables (the rotated-table variant ``simhash_near_pairs`` documents).

    Pigeonhole: split the ``bits`` fingerprint into ``max_hamming + 1``
    contiguous blocks — two fingerprints within Hamming distance d
    differ in at most d blocks, so at least one block matches exactly.
    Table t buckets on block t; the union of the d+1 bucket joins
    therefore finds EVERY pair with hamming ≤ d (modulo hot-bucket
    drops), unlike the single-prefix table whose recall is
    probabilistic.  The result set equals brute-force all-pairs
    hamming ≤ d — which is exactly how the oracle checks it.

    Plan shape: one explode (d+1 keys per doc), one equi-join on the
    (table, block) key — the multi-table twin of
    ``lsh_candidate_pairs``'s banded join.  A pair whose fingerprints
    agree on several blocks would match in several tables; with no
    bucket cap the join condition charges each pair to its *first*
    matching table ("all earlier blocks differ"), so every pair is
    emitted exactly once and the distinct disappears (a full shuffle
    of ~2M pair rows at sf0.1).  Under a ``max_bucket`` cap that trick
    would LOSE pairs whose first-matching bucket was dropped but whose
    later-table bucket survived (the first-match clause forbids the
    later emit), so the capped path keeps the distinct instead —
    correctness over the shuffle saving.  A dropped bucket then
    weakens the recall guarantee only for the boilerplate floods it
    exists to stop."""
    tables = max_hamming + 1
    base, rem = divmod(bits, tables)
    sizes = [base + (1 if t < rem else 0) for t in range(tables)]
    starts = [sum(sizes[:t]) for t in range(tables)]
    sh = materialize(
        df.select(F.col(id_col).alias("id"), simhash(text_col, bits).alias("sig"))
        .filter(F.col("sig").isNotNull()),
        checkpoint_mode,
    )
    keys = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                F.shiftright("sig", starts[t])
                .bitwiseAND(F.lit((1 << sizes[t]) - 1))
                .alias("k"),
            )
            for t in range(tables)
        ]
    )
    exploded = sh.select("id", "sig", F.explode(keys).alias("bk")).select(
        "id", "sig", F.col("bk.t").alias("t"), F.col("bk.k").alias("k")
    )
    exploded = cap_hot_buckets(exploded, ["t", "k"], max_bucket)
    a, b = exploded.alias("a"), exploded.alias("b")
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))

    def block(sig: Column, j: int) -> Column:
        return F.shiftright(sig, starts[j]).bitwiseAND(
            F.lit((1 << sizes[j]) - 1)
        )

    cond = (
        (F.col("a.t") == F.col("b.t"))
        & (F.col("a.k") == F.col("b.k"))
        & (F.col("a.id") < F.col("b.id"))
    )
    if max_bucket is None:
        # charge each pair to its first matching table: at table t,
        # every earlier block j < t must differ
        # (t <= j OR block_j(a) != block_j(b)).  Only valid uncapped —
        # see the docstring.
        for j in range(tables - 1):
            cond = cond & (
                (F.col("a.t") <= j)
                | (block(F.col("a.sig"), j) != block(F.col("b.sig"), j))
            )
    out = (
        a.join(b, cond)
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "hamming"
        )
    )
    return out if max_bucket is None else out.dropDuplicates(["id_a", "id_b"])


def ngram_contamination(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Cross-document n-gram contamination: per document, the fraction
    of its distinct n-gram shingles that also occur in at least one
    other document — the span-level leakage/duplication diagnostic run
    before benchmark decontamination or substring-level dedup (long
    shared spans surface here long before whole-document similarity
    trips).

    Set-based: explode distinct shingles once, count documents per
    shingle (map-side combined), join the counts back on the shingle
    key and re-aggregate per document — two shuffles on the shingle
    key plus one on the doc id, no pairwise work at any corpus size.
    Shingle-less documents report NULL fraction (no signal)."""
    # materialized once: `sh` feeds both the per-gram count and the
    # join probe side — inline, the tokenize→shingle pipeline would run
    # twice over the full corpus (same reuse rule as jaccard_pairs)
    sh = materialize(
        df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles(text_col, n)).alias("g"),
        ),
        checkpoint_mode,
    )
    per_gram = sh.groupBy("g").agg(F.count(F.lit(1)).alias("n_docs"))
    joined = sh.join(per_gram, "g")
    per_doc = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_shared"),
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        (F.col("n_shared").cast("double") / F.col("n_grams")).alias(
            "shared_frac"
        ),
    )


def positional_shingles(text: Column | str, n: int = 8) -> Column:
    """Word n-gram shingles in POSITION ORDER (no dedupe) — the
    positional twin of ``shingles`` for span-level analysis, where a
    gram's position and repetitions carry the signal."""

    def build(toks: Column) -> Column:
        k = F.size(toks) - (n - 1)
        return F.when(k >= 1,
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ).otherwise(F.array().cast("array<string>"))

    return let(tokens(normalize_text(text)), build)


def shared_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Substring-level contamination: per document, the longest run of
    CONSECUTIVE shingle positions whose grams each occur in at least
    one OTHER document — ≈ the longest shared span (a run of r
    shingles covers r+n−1 tokens).  ``ngram_contamination`` reports
    the *fraction* of shared grams; this reports their *contiguity*,
    which is what separates a long verbatim copy (one long run —
    benchmark leakage, licensing text) from scattered idiom overlap
    (many 1-runs).

    Set-based like the contamination pass — explode positional
    shingles, count distinct docs per gram, semi-join the shared-gram
    list back, then classic gaps-and-islands (idx − row_number) per
    document — so there is no pairwise work at any corpus size; every
    shuffle is keyed on the gram or the doc id.  The positional
    explode is materialized once (per ``checkpoint_mode``) because it
    feeds the gram counts, the probe side, and the per-doc totals."""
    pos = materialize(
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(positional_shingles(text_col, n)).alias("idx", "g"),
        ),
        checkpoint_mode,
    )
    per_gram = (
        pos.select("id", "g").distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    shared_pos = pos.join(
        per_gram.filter(F.col("n_docs") >= 2).select("g"), "g", "left_semi"
    )
    w = Window.partitionBy("id").orderBy("idx")
    run_lens = (
        shared_pos.withColumn("grp", F.col("idx") - F.row_number().over(w))
        .groupBy("id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    per_doc = (
        pos.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
        .join(
            shared_pos.groupBy("id").agg(
                F.count(F.lit(1)).alias("n_shared_pos")
            ),
            "id",
            "left",
        )
        .join(
            run_lens.groupBy("id").agg(
                F.max("run_len").alias("max_shared_run")
            ),
            "id",
            "left",
        )
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_shared_pos", F.lit(0)).alias("n_shared_pos"),
        F.coalesce("max_shared_run", F.lit(0)).alias("max_shared_run"),
    )


def cross_corpus_matches(
    corpus: DataFrame,
    probe: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    verify_threshold: float = 0.6,
    max_bucket: int | None = 10_000,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Cross-corpus near-duplicate matches — the decontamination
    primitive: which ``probe`` documents near-duplicate something in
    ``corpus`` (training data vs a benchmark/eval set, a fresh crawl
    vs the already-ingested corpus)?

    Same banded-MinHash shape as ``minhash_dedup_pairs`` but the
    bucket join runs ACROSS the two corpora (no a<b self-guard):
    signatures per side → explode band buckets → equi-join on
    (band, bucket) → distinct (probe, corpus) candidate → exact
    Jaccard verify on candidates only.  At 100 TB the corpus side's
    band frame is typically the small one (benchmarks are tiny) and
    broadcasts; neither corpus ever all-pairs.  Returns
    ``(probe_id, corpus_id, jaccard)`` for verified matches.
    """
    def _sh(df: DataFrame) -> DataFrame:
        return materialize(
            df.select(
                F.col(id_col).alias("id"), shingles(text_col, n).alias("sh")
            ),
            checkpoint_mode,
        )

    def _band_keys(sh: DataFrame) -> DataFrame:
        sigs = sh.select(
            "id", _minhash_fold(num_hashes)(F.col("sh")).alias("sig")
        ).select(
            "id",
            *[F.get("sig", i).alias(f"mh_{i}") for i in range(num_hashes)],
        )
        return band_key_frame(sigs, num_hashes, bands, max_bucket)

    sh_c, sh_p = _sh(corpus), _sh(probe)
    cands = (
        _band_keys(sh_p)
        .alias("p")
        .join(
            _band_keys(sh_c).alias("c"),
            (F.col("p.band") == F.col("c.band"))
            & (F.col("p.bucket") == F.col("c.bucket")),
        )
        .select(
            F.col("p.id").alias("probe_id"), F.col("c.id").alias("corpus_id")
        )
        .distinct()
    )
    joined = (
        cands.join(
            sh_p.select(
                F.col("id").alias("probe_id"), F.col("sh").alias("sh_p")
            ),
            "probe_id",
        )
        .join(
            sh_c.select(
                F.col("id").alias("corpus_id"), F.col("sh").alias("sh_c")
            ),
            "corpus_id",
        )
    )
    inter = F.size(F.array_intersect("sh_p", "sh_c")).cast("double")
    union = (F.size("sh_p") + F.size("sh_c")).cast("double") - inter
    return (
        joined.withColumn("jaccard", F.try_divide(inter, union))
        .filter(F.col("jaccard") >= verify_threshold)
        .select("probe_id", "corpus_id", "jaccard")
    )


# ---------------------------------------------------- prefix filtering
def prefix_filter_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """EXACT Jaccard-threshold similarity join over word ``n``-gram
    shingle sets via prefix filtering (AllPairs, Bayardo/Ma/Srikant
    WWW'07) — the scalable *exact* alternative to both
    ``jaccard_pairs`` (quadratic on any shared shingle) and MinHash
    LSH (approximate).  Same inputs and same answer as
    ``jaccard_pairs``; only the plan differs.

    Order every document's shingle set by one global total order
    (document frequency ascending, shingle ascending — rarest first),
    and index only the first ``|A| − ⌈τ·|A|⌉ + 1`` shingles of each.
    If J(A,B) ≥ τ then |A∩B| ≥ τ·max(|A|,|B|); were A's prefix
    disjoint from A∩B, the shared shingles would all sit in A's suffix
    of length ⌈τ|A|⌉ − 1 < τ|A| ≤ |A∩B| — contradiction, so each
    side's prefix contains a shared shingle; under one total order the
    *lowest-ranked* shared shingle is in BOTH prefixes, so the prefix
    equi-join has no false negatives.  False positives are removed by
    an exact verify on the candidate pairs only.

    Shape at scale: shingle-frequency count (one shuffle), per-document
    sort of its own shingles (map-side, bounded by document length),
    prefix explode (Σ prefix lengths ≪ corpus shingles when τ is
    high), equi-join on the prefix shingle, distinct, verify.  Rare
    shingles lead the order, so prefix-join buckets are the *small*
    postings — the boilerplate megabuckets that cripple the naive join
    never enter the index.
    """
    toks = materialize(
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            shingles(text_col, n).alias("tk"),
        )
        .filter(F.size("tk") >= 1),
        checkpoint_mode,
    )
    tok_df = (
        toks.select(F.explode("tk").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df_t"))
    )
    # Global total order (df asc, token asc) applied per document:
    # join each doc's tokens to their frequencies, re-assemble the
    # ordered array with sort_array(struct(df, token)).
    ordered = (
        toks.select("id", F.size("tk").alias("n"), F.explode("tk").alias("t"))
        .join(tok_df, "t")
        .groupBy("id", "n")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("df_t", "t"))),
                lambda s: s["t"],
            ).alias("tk_ord")
        )
    )
    # Required overlap: smallest integer c with (c/n as double) >= tau.
    # J = inter/union with union >= n (union contains this doc's own
    # set), and correctly-rounded double division is monotone in the
    # denominator, so inter/n >= inter/union >= tau whenever the verify
    # filter passes — the prefix bound derived from this exact-integer
    # req can therefore never miss a pair the verify stage would keep,
    # unlike the raw float ceil(tau*n) (see min_count_for_ratio).
    prefix_len = F.col("n") - min_count_for_ratio(F.col("n"), threshold) + 1
    prefixes = materialize(
        ordered.select(
            "id",
            "n",
            "tk_ord",
            F.slice("tk_ord", 1, prefix_len.cast("int")).alias("pref"),
        ),
        checkpoint_mode,
    )
    pe = prefixes.select(
        "id", "n", F.posexplode("pref").alias("pos", "t")
    )
    # PPJoin refinements (Xiao et al. WWW'08), both RELAXED so float
    # rounding can only under-prune, never drop a true pair:
    # * length filter: J ≥ τ ⇒ |small| ≥ τ·|large| — pruning at
    #   floor(τ·n) keeps the boundary;
    # * positional bound: the global df-order means the first common
    #   prefix token has MINIMAL position in both lists at once, so
    #   per pair min(pos_a)/min(pos_b) come from the same token and
    #   overlap ≤ 1 + min(n_a − pos_a, n_b − pos_b); a pair needs
    #   overlap ≥ τ/(1+τ)·(n_a+n_b) (relaxed to floor) to reach τ.
    raw = pe.alias("a").join(
        pe.alias("b"),
        (F.col("a.t") == F.col("b.t"))
        & (F.col("a.id") < F.col("b.id"))
        & (F.col("a.n") >= F.floor(F.lit(threshold) * F.col("b.n")))
        & (F.col("b.n") >= F.floor(F.lit(threshold) * F.col("a.n"))),
    )
    cands = (
        raw.groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(
            F.min("a.pos").alias("pa"),
            F.min("b.pos").alias("pb"),
        )
        .filter(
            # pos is 0-based: common tokens live in a[pa:] (n_a − pa
            # slots) and b[pb:], so overlap ≤ min of the two tails
            F.least(
                F.col("n_a") - F.col("pa"), F.col("n_b") - F.col("pb")
            )
            >= F.floor(
                F.lit(threshold / (1.0 + threshold))
                * (F.col("n_a") + F.col("n_b"))
            )
        )
        .select("id_a", "id_b")
    )
    verified = (
        cands.join(
            prefixes.select(F.col("id").alias("id_a"), F.col("tk_ord").alias("tk_a")),
            "id_a",
        )
        .join(
            prefixes.select(F.col("id").alias("id_b"), F.col("tk_ord").alias("tk_b")),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("tk_a", "tk_b")).cast("double")
    union = (F.size("tk_a") + F.size("tk_b")).cast("double") - inter
    return (
        verified.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """ExactSubstr-style span dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): delete every token
    covered by an n-gram occurring ≥ ``min_count`` times in the whole
    corpus (across documents or repeated within one), and re-assemble
    each document from its surviving tokens.

    Where ``shared_span_stats`` only *measures* duplicated spans, this
    is the *removal* operator a curation pipeline actually runs.  Set
    shape, no pairwise work at any size:

    * positional n-grams explode once (linear in corpus tokens);
    * one count shuffle on the gram key;
    * flagged occurrences expand to their covered token positions
      (×n fan-out, bounded) and dedupe on (doc, position);
    * a left-anti join drops covered tokens; one per-document groupBy
      re-assembles survivors in order.

    Output: ``id_col, n_tokens, n_removed, clean_text`` (tokens are
    the lowercased whitespace tokens of the raw text; clean_text joins
    survivors with single spaces — '' when everything was removed).
    NULL-text documents keep NULL clean_text and zero counts."""
    toked = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            tokens(F.col(text_col)).alias("tk"),
        )
    )
    tok_rows = materialize(
        toked.select(
            "id", F.posexplode_outer("tk").alias("tpos0", "tok")
        ).select("id", (F.col("tpos0") + 1).alias("tpos"), "tok"),
        checkpoint_mode,
    )
    # positional grams straight from the token frame's arrays
    grams = toked.select(
        "id",
        F.posexplode(
            F.when(
                F.size("tk") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("tk", i, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gpos0", "g"),
    ).select("id", (F.col("gpos0") + 1).alias("gpos"), "g")
    grams = materialize(grams, checkpoint_mode)
    dup_grams = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("g")
    )
    covered = (
        grams.join(dup_grams, "g", "left_semi")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + (n - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    kept = tok_rows.filter(F.col("tok").isNotNull()).join(
        covered, ["id", "tpos"], "left_anti"
    )
    reb = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("tpos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    totals = tok_rows.groupBy("id").agg(
        F.count("tok").alias("n_tokens")
    )
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    return (
        base.join(totals, "id", "left")
        .join(reb, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            (
                F.coalesce("n_tokens", F.lit(0))
                - F.coalesce("n_kept", F.lit(0))
            ).alias("n_removed"),
            F.when(
                F.col("__t").isNotNull(), F.coalesce("clean_text", F.lit(""))
            ).alias("clean_text"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """EXACT containment-threshold join: pairs (a, b) with
    C(a, b) = |Sₐ ∩ S_b| / |Sₐ| ≥ τ over word n-gram shingle sets —
    the ASYMMETRIC cousin of prefix_filter_pairs' Jaccard join, and
    the right predicate for quote/subset/near-superset detection
    (a 50-shingle excerpt inside a 5000-shingle page has Jaccard
    ≈ 0.01 but containment 1.0).

    Prefix filter adapts (Chaudhuri/Ganti/Kaushik ICDE'06 SSJoin):
    under the global (df asc, shingle asc) order, if C(a,b) ≥ τ then
    a's prefix of length |Sₐ| − ⌈τ|Sₐ|⌉ + 1 must share a shingle
    with S_b — were it disjoint, all ≥ ⌈τ|Sₐ|⌉ shared shingles would
    sit in the suffix of length ⌈τ|Sₐ|⌉ − 1, a contradiction.  The
    CONTAINED side indexes only its prefix; the containing side must
    index ALL its shingles (no symmetric bound exists — that is the
    price of asymmetry and why the candidate stage is bigger than
    Jaccard's; rare-first ordering keeps the joined postings small).

    Self-pairs are excluded; both (a,b) and (b,a) can qualify
    independently.  Output: ``id_a, id_b, containment`` where id_a is
    the contained side.
    """
    toks = materialize(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), shingles(text_col, n).alias("tk"))
        .filter(F.size("tk") >= 1),
        checkpoint_mode,
    )
    dfc = (
        toks.select(F.explode("tk").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df_t"))
    )
    ordered = materialize(
        toks.select("id", F.size("tk").alias("n"), F.explode("tk").alias("t"))
        .join(dfc, "t")
        .groupBy("id", "n")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("df_t", "t"))),
                lambda s: s["t"],
            ).alias("tk_ord")
        ),
        checkpoint_mode,
    )
    # Required overlap c = smallest integer with (c/n as double) ≥ τ —
    # the EXACT comparison the verify stage runs (shared helper; see
    # min_count_for_ratio for the float-ceil hazard it repairs).
    prefix_len = F.col("n") - min_count_for_ratio(F.col("n"), threshold) + 1
    pe = ordered.select(
        "id", F.explode(F.slice("tk_ord", 1, prefix_len.cast("int"))).alias("t")
    )
    full = ordered.select(
        F.col("id").alias("id_b"), F.explode("tk_ord").alias("t")
    )
    cands = (
        pe.alias("a")
        .join(full, "t")
        .filter(F.col("a.id") != F.col("id_b"))
        .select(F.col("a.id").alias("id_a"), "id_b")
        .distinct()
    )
    verified = (
        cands.join(
            ordered.select(F.col("id").alias("id_a"), F.col("tk_ord").alias("tk_a")),
            "id_a",
        )
        .join(
            ordered.select(F.col("id").alias("id_b"), F.col("tk_ord").alias("tk_b")),
            "id_b",
        )
    )
    containment = F.size(F.array_intersect("tk_a", "tk_b")).cast(
        "double"
    ) / F.size("tk_a").cast("double")
    return (
        verified.withColumn("containment", containment)
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


class CorpusDedupState(NamedTuple):
    """Persisted dedup state of an already-ingested corpus — exactly
    the two frames an admission gate needs, and NOTHING text-sized:

    * ``fingerprints`` — distinct normalized-content md5s, one column
      ``fp`` (the q25 exact-dup key);
    * ``band_keys`` — ``(id, band, bucket)`` banded-MinHash keys (the
      q86 candidate-generation key).

    In production both live as tables the nightly pipeline keeps warm
    (the ``hll_partials``/``hll_merge`` shape: build once, union
    deltas, never rebuild).  Parameters are carried along because a
    state built with one (num_hashes, bands, n) is meaningless under
    another — ``admit_new_documents`` hashes the probe side with the
    STATE's parameters, not its own defaults.
    """

    fingerprints: DataFrame
    band_keys: DataFrame
    num_hashes: int
    bands: int
    n: int


def _signature_frame(
    docs: DataFrame, text_col: str, id_col: str, num_hashes: int, n: int
) -> DataFrame:
    """Wide ``(id, mh_0..mh_{k-1})`` MinHash signature frame — the
    shared input of ``band_key_frame`` for every cross-corpus path."""
    return (
        docs.select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh"))
        .select("id", _minhash_fold(num_hashes)(F.col("sh")).alias("sig"))
        .select(
            "id",
            *[F.get("sig", i).alias(f"mh_{i}") for i in range(num_hashes)],
        )
    )


def build_corpus_state(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    max_bucket: int | None = 10_000,
    checkpoint_mode: str = "local",
) -> CorpusDedupState:
    """ONE full pass over corpus text → the persisted
    ``CorpusDedupState`` every subsequent admission batch reuses.
    Runs once at corpus bootstrap (or never, if the ingest pipeline
    built the state incrementally via ``union_corpus_state`` from day
    one); after that, corpus text is only ever touched by the bounded
    candidate verify inside ``admit_new_documents``.
    """
    from db_factfinder_spark.llmdata.textstats import fingerprint

    fp = materialize(
        corpus.filter(F.col(text_col).isNotNull())
        .select(fingerprint(F.col(text_col)).alias("fp"))
        .distinct(),
        checkpoint_mode,
    )
    bk = materialize(
        band_key_frame(
            _signature_frame(corpus, text_col, id_col, num_hashes, n),
            num_hashes,
            bands,
            max_bucket,
        ),
        checkpoint_mode,
    )
    return CorpusDedupState(fp, bk, num_hashes, bands, n)


def union_corpus_state(
    state: CorpusDedupState,
    admitted_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = 10_000,
    checkpoint_mode: str = "local",
) -> CorpusDedupState:
    """Fold a just-admitted batch into the persisted state — the
    incremental-ingest closing step: hash ONLY the new batch (with the
    state's own parameters), union its fingerprints and band keys into
    the warm frames.  Corpus text is never re-read; cost is O(batch),
    not O(corpus).  ``union_corpus_state(build_corpus_state(A), B)``
    is row-identical to ``build_corpus_state(A ∪ B)`` (pytest-pinned),
    so a state grown delta-by-delta never drifts from a rebuild."""
    delta = build_corpus_state(
        admitted_docs,
        text_col=text_col,
        id_col=id_col,
        num_hashes=state.num_hashes,
        bands=state.bands,
        n=state.n,
        max_bucket=max_bucket,
        checkpoint_mode=checkpoint_mode,
    )
    return CorpusDedupState(
        materialize(
            state.fingerprints.union(delta.fingerprints).distinct(),
            checkpoint_mode,
        ),
        materialize(
            state.band_keys.union(delta.band_keys), checkpoint_mode
        ),
        state.num_hashes,
        state.bands,
        state.n,
    )


def admit_new_documents(
    corpus: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    verify_threshold: float = 0.6,
    max_bucket: int | None = 10_000,
    checkpoint_mode: str = "local",
    corpus_state: CorpusDedupState | None = None,
) -> DataFrame:
    """Incremental-ingest admission gate: classify each NEW document
    against the ALREADY-INGESTED corpus as ``exact_dup`` (identical
    normalized fingerprint), ``near_dup`` (banded-MinHash candidate
    verified at Jaccard ≥ verify_threshold), or ``admitted`` — the
    nightly-batch operation a continuously-growing corpus runs
    instead of ever re-deduplicating itself from scratch.

    Scale contract: pass ``corpus_state`` (built once via
    ``build_corpus_state``, grown per batch via ``union_corpus_state``)
    and corpus TEXT is read exactly once per batch — the bounded
    candidate verify, which fetches only the corpus rows whose band
    keys collided with the new batch (candidate ids are batch-sized,
    so AQE broadcasts them against the corpus scan; a lakehouse with
    id-clustered files additionally prunes that scan to candidate
    row groups).  Everything corpus-SIZED the gate touches — the
    fingerprint set (one keyed equi-join, NOT broadcast) and the band
    keys — comes from the persisted state, never recomputed.  With
    ``corpus_state=None`` the state is built in-call from corpus text
    (the bootstrap / one-shot path; answer identical, plan-audited).

    Exact beats near in the status (a byte-identical copy is reported
    as exact even though its Jaccard is 1.0).  NULL-text newcomers
    have no fingerprint and no shingles — admitted by construction,
    surfaced by their status for upstream triage.

    Output: ``id_col, status`` for every new document.
    """
    from db_factfinder_spark.llmdata.textstats import fingerprint

    if corpus_state is None:
        corpus_state = build_corpus_state(
            corpus,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            n=n,
            max_bucket=max_bucket,
            checkpoint_mode=checkpoint_mode,
        )
    newd = new_docs.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fp")
    )
    exact = newd.join(
        corpus_state.fingerprints.withColumn("__hit", F.lit(1)), "fp", "left"
    ).select(id_col, F.col("__hit").isNotNull().alias("__exact"))

    sh_p = materialize(
        new_docs.select(
            F.col(id_col).alias("id"),
            shingles(text_col, corpus_state.n).alias("sh"),
        ),
        checkpoint_mode,
    )
    bk_p = band_key_frame(
        sh_p.select(
            "id", _minhash_fold(corpus_state.num_hashes)(F.col("sh")).alias("sig")
        ).select(
            "id",
            *[
                F.get("sig", i).alias(f"mh_{i}")
                for i in range(corpus_state.num_hashes)
            ],
        ),
        corpus_state.num_hashes,
        corpus_state.bands,
        max_bucket,
    )
    cands = (
        bk_p.alias("p")
        .join(
            corpus_state.band_keys.alias("c"),
            (F.col("p.band") == F.col("c.band"))
            & (F.col("p.bucket") == F.col("c.bucket")),
        )
        .select(
            F.col("p.id").alias("probe_id"), F.col("c.id").alias("corpus_id")
        )
        .distinct()
    )
    # the ONE corpus-text read: shingle only the candidate rows
    sh_c = (
        corpus.join(
            cands.select(F.col("corpus_id").alias("__cid")).distinct(),
            F.col(id_col) == F.col("__cid"),
        )
        .select(
            F.col(id_col).alias("corpus_id"),
            shingles(text_col, corpus_state.n).alias("sh_c"),
        )
    )
    joined = cands.join(
        sh_p.select(F.col("id").alias("probe_id"), F.col("sh").alias("sh_p")),
        "probe_id",
    ).join(sh_c, "corpus_id")
    inter = F.size(F.array_intersect("sh_p", "sh_c")).cast("double")
    union = (F.size("sh_p") + F.size("sh_c")).cast("double") - inter
    near = (
        joined.withColumn("jaccard", F.try_divide(inter, union))
        .filter(F.col("jaccard") >= verify_threshold)
        .select(F.col("probe_id").alias(id_col))
        .distinct()
        .withColumn("__near", F.lit(True))
    )
    return (
        exact.join(near, id_col, "left")
        .select(
            id_col,
            F.when(F.col("__exact"), F.lit("exact_dup"))
            .when(F.col("__near").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("admitted"))
            .alias("status"),
        )
    )


def char_shingles(text: Column | str, n: int = 4) -> Column:
    """Character n-gram shingle set (distinct) over NORMALIZED text —
    the shingle basis for space-free scripts (CJK, Thai) where word
    shingles degenerate to whole-sentence tokens.  Same let-binding
    rule as ``shingles``: the normalized string materializes once,
    each gram is one substring slice.  Interoperates with every
    downstream MinHash/LSH stage (``minhash_dedup_pairs(shingle_fn=
    lambda c: char_shingles(c, 4))``) — the pipeline is shingle-
    representation agnostic."""

    def build(s: Column) -> Column:
        k = F.length(s) - (n - 1)
        return F.when(
            k >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), k),
                    lambda i: F.substring(s, i, F.lit(n)),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let(normalize_text(text), build)


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask: int = 63,
) -> DataFrame:
    """Content-defined chunking — the storage-dedup splitter
    (LBFS/restic/borg family): a chunk boundary falls AFTER position
    *i* iff the hash of the ``window``-gram ending at *i* satisfies
    ``h % (mask + 1) == 0`` — equivalent to the classic
    ``h & mask == 0`` because ``mask + 1`` is REQUIRED to be a power
    of two (validated below; a mask like 100 would silently give
    mod-101 semantics otherwise).  Boundaries are anchored to
    CONTENT, not offsets — inserting one byte shifts one chunk, not
    every chunk after it (the fixed-size-block failure CDC exists to
    avoid).

    The per-position hash is the engine's md5-literal idiom (first 28
    bits of md5 of the substring), expression-only: one
    ``transform(sequence)`` over positions, a filter to boundary
    offsets, and a ``zip_with`` over adjacent boundaries to slice the
    chunks — zero joins, zero shuffles, no Python.  Texts shorter than
    ``window`` form one whole-text chunk.  Expected chunk length is
    ``mask + 1`` characters.

    Returns one row per chunk: ``{id_col}, chunk_idx, chunk,
    chunk_len``.  Downstream chunk-level dedup is a plain hash groupBy
    on ``md5(chunk)`` — see q288.
    """
    if mask < 0 or (mask + 1) & mask:
        raise ValueError(
            f"mask must be 2^k - 1 (got {mask}): the boundary rule is "
            "h & mask == 0, implemented as h % (mask+1) == 0, and the "
            "two agree only when mask+1 is a power of two"
        )
    t = F.col(text_col)
    n = F.length(t)
    pos_hash_ok = lambda i: (  # noqa: E731 — md5 28-bit of window at i
        F.conv(
            F.substring(
                F.md5(t.substr(i - window + 1, F.lit(window))), 1, 7
            ),
            16, 10,
        ).cast("long")
        % F.lit(mask + 1)
        == 0
    )
    # candidate cut offsets: after position i for i in [window, n-1]
    # (a boundary at n would duplicate the final sentinel)
    cuts = F.when(
        n >= window + 1,
        F.filter(
            F.transform(
                F.sequence(F.lit(window), n - 1),
                lambda i: F.when(pos_hash_ok(i), i).otherwise(F.lit(-1)),
            ),
            lambda x: x >= 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    bounds = F.concat(
        F.array(F.lit(0).cast("int")),
        cuts.cast("array<int>"),
        F.array(n.cast("int")),
    )
    chunks = F.zip_with(
        F.slice(bounds, 1, F.size(bounds) - 1),
        F.slice(bounds, 2, F.size(bounds) - 1),
        lambda s, e: t.substr(s + 1, e - s),
    )
    return docs.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).select(
        id_col, "chunk_idx", "chunk", F.length("chunk").alias("chunk_len")
    )


def lsh_parameter_plan(
    spark,
    total_hashes: int = 128,
    threshold: tuple[int, int] = (4, 5),
    grid_den: int = 100,
) -> DataFrame:
    """MinHash-LSH banding planner: for every power-of-two split of
    ``total_hashes`` into b bands × r rows, integrate the S-curve
    ``P(s) = 1 − (1 − s^r)^b`` against the target threshold and rank
    the splits by false-positive + false-negative mass — the tuning
    table a deployment consults BEFORE committing a 100 TB corpus to
    one banding (re-sharding signatures later re-shuffles everything).

    Exactness: the similarity grid is the rational s = k/grid_den
    (one exact division per point), the powers are PURE SQUARING
    CHAINS (b and r powers of two → every step is one IEEE multiply
    of identical operands, bit-identical on any engine — this is WHY
    the planner restricts to power-of-two splits), the threshold
    comparison is integer cross-multiplication, and the masses are
    integer nano-unit sums.

    Runs as ``log2(total_hashes)−1`` unioned aggregates over the
    shared grid — pure compute, no data tables.
    """
    tn, td = threshold
    if total_hashes & (total_hashes - 1) != 0 or total_hashes < 4:
        raise ValueError("total_hashes must be a power of two >= 4")
    arms = []
    r = 2
    while r <= total_hashes // 2:
        arms.append((total_hashes // r, r))
        r *= 2

    grid = spark.range(1, grid_den).select(F.col("id").alias("kk"))

    def _square(x, e: int):
        while e > 1:
            x = x * x
            e //= 2
        return x

    parts = []
    for b, rr in arms:
        s = F.col("kk").cast("double") / F.lit(float(grid_den))
        p_match = F.lit(1.0) - _square(F.lit(1.0) - _square(s, rr), b)
        nano_p = F.floor(p_match * F.lit(1e9) + F.lit(0.5)).cast("long")
        nano_q = F.floor(
            (F.lit(1.0) - p_match) * F.lit(1e9) + F.lit(0.5)
        ).cast("long")
        below = F.col("kk") * F.lit(td) < F.lit(grid_den * tn)
        parts.append(
            grid.agg(
                F.sum(F.when(below, nano_p).otherwise(F.lit(0))).alias(
                    "fp_nano"
                ),
                F.sum(F.when(~below, nano_q).otherwise(F.lit(0))).alias(
                    "fn_nano"
                ),
            ).select(
                F.lit(b).alias("bands"),
                F.lit(rr).alias("rows_per_band"),
                "fp_nano",
                "fn_nano",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "bands",
        "rows_per_band",
        "fp_nano",
        "fn_nano",
        (F.col("fp_nano") + F.col("fn_nano")).alias("total_nano"),
    )
