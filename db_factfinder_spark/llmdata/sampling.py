"""Deterministic sampling and dataset splitting.

Training-data pipelines need *reproducible* sampling: the same document
must land in the same split on every run, on any cluster layout, so
train/val/test never leak into each other across reprocessing.  Random
samplers (``df.sample``) are seed- and partitioning-dependent; instead
the bucket is a pure function of the stable document id via md5
(portable — any engine, and the SQL oracle, derives the identical
bucket), computed map-side with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket(id_col: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): first 28 bits of md5 of the id's
    string form, mod buckets.  DuckDB mirror:
    ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 7))::BIGINT % buckets``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 7), 16, 10).cast("long")
    return h % buckets


def split_column(
    id_col: Column | str,
    train: int = 80,
    val: int = 10,
    buckets: int = 100,
) -> Column:
    """'train' / 'val' / 'test' label from the stable hash bucket:
    [0, train) → train, [train, train+val) → val, rest → test."""
    b = hash_bucket(id_col, buckets)
    return (
        F.when(b < train, F.lit("train"))
        .when(b < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def deterministic_sample(
    id_col: Column | str, fraction: float, buckets: int = 10_000
) -> Column:
    """Boolean keep-mask selecting a stable ~``fraction`` of rows:
    bucket < round(fraction·buckets) (round, not int — float products
    like 0.57·100 = 56.999… would truncate a bucket short).  Unlike
    ``df.sample`` the selection is partitioning-independent and
    repeatable."""
    return hash_bucket(id_col, buckets) < round(fraction * buckets)


def mixture_sample(
    id_col: Column | str,
    group_col: Column | str,
    weights: dict[str, float],
    default: float = 0.0,
    buckets: int = 10_000,
) -> Column:
    """Keep-mask for weighted mixture sampling: each group (source,
    language, domain…) keeps its own deterministic fraction — the
    knob that turns a raw crawl into a training mixture.  Same
    md5-stable buckets as ``deterministic_sample``, so the selection
    is reproducible and per-document stable even as weights change
    for *other* groups."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    b = hash_bucket(id_col, buckets)
    thresh = None
    for group, w in weights.items():
        clause = (g == group, F.lit(round(w * buckets)))
        thresh = F.when(*clause) if thresh is None else thresh.when(*clause)
    default_t = F.lit(round(default * buckets))
    thresh = default_t if thresh is None else thresh.otherwise(default_t)
    return b < thresh


def priority_sample(df, id_col: str, weight_col, k: int):
    """Deterministic priority sampling (Duffield, Lund & Thorup,
    JACM 2007): weight-sensitive sampling WITHOUT replacement whose
    k-item sample supports unbiased subset-sum estimation — the
    principled way to keep a fixed-size audit sample of a weighted
    corpus (bytes, tokens, cost) that still answers "how much weight
    does slice X hold" from the sample alone.

    Each item gets priority q = w / u with u uniform in (0, 1]; the
    sample is the top-``k`` by priority and τ is the (k+1)-th
    priority; each kept item's weight estimator is max(w, τ), which
    is unbiased for subset sums over the sample.

    Determinism & portability: u = (h + 1) / 2²⁸ with h the first 28
    md5 bits of the id; q = w·2²⁸/(h+1) where the numerator is an
    EXACT int64 product, and both the int64→double cast and the
    division are correctly rounded under IEEE 754 — two deterministic
    ops every engine performs identically, so the priority (and the
    kept set) is bit-identical anywhere (the textbook alternative —
    ln-based exponential keys — would inherit libm's last bit).
    Ties broken by id, so the kept set is a pure function of the data.

    Scale shape: priorities are map-side expressions; top-(k+1) is
    Spark's TakeOrdered (per-partition heap + driver merge of k+1
    rows per partition — no global sort, no full shuffle); τ comes
    back as a 1-row broadcast.  Weights must be positive.

    Output: ``id_col, w (the weight), priority, est = max(w, τ)``,
    one row per sampled item (k rows, fewer if the input is smaller).
    """
    w_c = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10
    ).cast("long")
    # q = (w * 2^28) / (h + 1): exact int64 numerator (the long cast
    # matters under ANSI — int32 weights would overflow the product),
    # then one correctly-rounded IEEE division
    q = (w_c.cast("long") * F.lit(268435456)).cast("double") / (
        h + F.lit(1)
    ).cast("double")
    scored = df.select(
        F.col(id_col), w_c.alias("w"), q.alias("priority")
    )
    topk1 = scored.orderBy(
        F.col("priority").desc(), F.col(id_col).asc()
    ).limit(k + 1)
    # τ is the (k+1)-th priority; when the input has ≤ k items the
    # whole population is kept and the estimator degenerates to the
    # true weights (τ = 0), not to the smallest kept priority
    tau = topk1.agg(
        F.when(F.count(F.lit(1)) == k + 1, F.min("priority"))
        .otherwise(F.lit(0.0))
        .alias("tau")
    )
    return (
        topk1.orderBy(F.col("priority").desc(), F.col(id_col).asc())
        .limit(k)
        .crossJoin(F.broadcast(tau))
        .select(
            id_col,
            "w",
            "priority",
            F.greatest(F.col("w").cast("double"), F.col("tau")).alias("est"),
        )
    )


def priority_sample_per_group(
    df, id_col: str, weight_col, group_col: str, k: int
):
    """Per-group priority sampling: an independent Duffield–Lund–
    Thorup k-sample per group (domain, language, source…) with each
    group's own threshold τ_g — the stratified audit-sample that keeps
    a bounded, weight-sensitive slice of EVERY stratum (a single
    global sample lets one heavy domain crowd out the rest).

    Same exact-arithmetic priorities as ``priority_sample``; the
    top-(k+1) per group comes from ONE rank window on the group key
    (no TakeOrdered per group, no driver round-trips), τ_g is the
    (k+1)-th priority within the group (0 when the group is smaller —
    census degeneracy per group), and est = max(w, τ_g).

    One shuffle (the window); a skewed giant group concentrates one
    window partition exactly like any keyed shuffle — AQE skew
    handling applies, and the output is bounded at k·groups.

    Output: ``group_col, id_col, w, priority, est``.
    """
    from pyspark.sql import Window

    w_c = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10
    ).cast("long")
    q = (w_c.cast("long") * F.lit(268435456)).cast("double") / (
        h + F.lit(1)
    ).cast("double")
    win = Window.partitionBy(group_col).orderBy(
        F.col("priority").desc(), F.col(id_col).asc()
    )
    ranked = (
        df.select(
            F.col(group_col), F.col(id_col), w_c.alias("w"),
            q.alias("priority"),
        )
        .withColumn("__rk", F.row_number().over(win))
        .filter(F.col("__rk") <= k + 1)
    )
    tau = ranked.groupBy(group_col).agg(
        F.max(
            F.when(F.col("__rk") == k + 1, F.col("priority"))
        ).alias("__tau")
    )
    # no broadcast hint on τ: it is |groups| rows — tiny for domains/
    # languages (AQE converts to broadcast), but a forced hint would
    # OOM on pathological group cardinality; unhinted, the join keys
    # are already co-partitioned by the window shuffle
    return (
        ranked.filter(F.col("__rk") <= k)
        .join(tau, group_col)
        .select(
            group_col,
            id_col,
            "w",
            "priority",
            F.greatest(
                F.col("w").cast("double"),
                F.coalesce(F.col("__tau"), F.lit(0.0)),
            ).alias("est"),
        )
    )


def cap_per_group(df, group_cols, order_by, cap: int, rank_col: str = "rank"):
    """Per-group quota cap: keep at most ``cap`` rows per group, chosen
    by the deterministic ``order_by`` ranking (pass an explicit
    tiebreak column — e.g. the document id — so the kept set is
    reproducible on any cluster layout).  The standard per-domain /
    per-source cap that stops a handful of giant crawl domains from
    dominating a training mixture.

    ONE shuffle (the rank window on the group key); a skewed giant
    group concentrates one window partition exactly like any keyed
    shuffle — AQE skew handling applies, and the cap itself bounds the
    *output* per group regardless.  The rank is kept as ``rank_col``
    for downstream budget accounting.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= cap)
    )


def budget_fill(df, group_cols, order_by, size_col, budget: int):
    """Budget-constrained selection: per group, keep the maximal
    PREFIX of the ``order_by`` ranking whose cumulative ``size_col``
    fits in ``budget`` — the token-budget cut that turns a ranked
    corpus into a fixed-size training mixture slice.  Sizes must be
    positive, which makes the running total monotone, so the simple
    ``cum ≤ budget`` filter IS the maximal prefix (everything after
    the first overflow also overflows).

    One window shuffle on the group key; the cumulative size is kept
    as ``cum_size`` for budget accounting downstream.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    cum = F.sum(F.col(size_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("cum_size", cum).filter(
        F.col("cum_size") <= budget
    )


def shuffle_shards(df, id_col: str, n_shards: int = 64):
    """Deterministic global shuffle for training epochs, sharded:
    every row gets (shard, rank_in_shard) from md5 of its stable id —
    shard = 28 md5 bits mod n_shards, rank = md5-order within the
    shard.  Reading shards 0..n−1 sequentially yields a fixed
    pseudorandom permutation of the dataset that is REPRODUCIBLE on
    any cluster layout and any run — unlike ``df.orderBy(rand())``,
    which is seed- and partitioning-dependent, and unlike a single
    global sort, which funnels the corpus through one ordering stage.

    The rank window partitions by shard — n_shards-way parallel, each
    sorting ~n/n_shards rows.  Downstream, ``write.partitionBy``
    on the shard column gives one file set per shard, which is the
    layout epoch readers actually consume.

    Output: original columns + ``shard int, shard_rank`` (1-based).
    """
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    shard = (
        F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(
        F.col("__hkey"), F.col(id_col)
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("__hkey", h)
        .withColumn("shard_rank", F.row_number().over(w))
        .drop("__hkey")
    )


def temperature_allocation(df, domain_col: str = "source", budget: int = 1000):
    """Temperature-scaled sampling allocation across domains — the
    data-mixing step of multilingual / multi-source corpus
    construction (XLM-R, mT5: sample domain d with probability
    ∝ n_d^α, α < 1, so head domains stop drowning the tail): given
    per-domain document counts, split an integer sampling ``budget``
    exactly, with weights n_d^(1/2).

    α is FIXED at ½ because sqrt is an IEEE correctly-rounded
    primitive — every engine computes the identical double, where a
    general pow(n, α) = exp(α·ln n) inherits two libm rounding steps
    (the same reasoning that bans log from bm25/tfidf/surprisal).

    Exact-integer allocation: sqrt weights are 1e-6 fixed-pointed to
    bigints (order-free sum); each domain's base share is the exact
    integer floor (budget·w_d) DIV Σw, and the remaining
    budget − Σ base units go to the largest integer remainders
    (largest-remainder / Hamilton method), ties by domain name — so
    Σ alloc == budget exactly, bit-identically on any engine.

    Plan: one count shuffle on domain; everything after runs on the
    domain-cardinality frame (bounded — sources, not documents), so
    the single-partition ranking window is a non-issue at any corpus
    size.

    Output: ``domain_col, n_docs, sqrt_micro, base_alloc, remainder,
    alloc``.
    """
    from pyspark.sql import Window

    n_d = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = n_d.withColumn(
        "sqrt_micro",
        F.floor(
            F.sqrt(F.col("n_docs").cast("double")) * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long"),
    )
    tot = w.agg(F.sum("sqrt_micro").alias("__tot"))
    j = w.crossJoin(F.broadcast(tot)).select(
        domain_col,
        "n_docs",
        "sqrt_micro",
        (F.lit(budget).cast("long") * F.col("sqrt_micro"))
        .alias("__num"),
        F.col("__tot"),
    )
    base = j.select(
        domain_col,
        "n_docs",
        "sqrt_micro",
        F.expr("__num DIV __tot").alias("base_alloc"),
        F.expr("__num % __tot").alias("remainder"),
    )
    leftover = F.lit(budget).cast("long") - F.sum("base_alloc").over(
        Window.partitionBy()
    )
    rk = F.row_number().over(
        Window.orderBy(F.desc("remainder"), F.asc(domain_col))
    )
    return base.select(
        domain_col,
        "n_docs",
        "sqrt_micro",
        "base_alloc",
        "remainder",
        (
            F.col("base_alloc")
            + F.when(rk <= leftover, F.lit(1)).otherwise(F.lit(0))
        ).alias("alloc"),
    )


def stratified_split(
    df,
    strata_col: str = "source",
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
):
    """EXACT-count stratified train/val/test split: within every
    stratum the bucket sizes are the integer floors n·p DIV 100 (test
    takes the remainder), assigned in the md5-shuffled deterministic
    order — the reproducible-split guarantee ``split_column``'s hash
    buckets give IN EXPECTATION, hardened to exact counts (a 500-doc
    rare-language stratum under a hash split can land 70/30; training
    mixes care).

    Determinism: the within-stratum order is (md5(id), id) — content-
    free, partition-invariant, engine-portable — so the same document
    lands in the same split on every run and any engine; adding NEW
    documents to a stratum reshuffles it (exact quotas and insertion
    stability are mutually exclusive; pipelines needing the latter use
    split_column).

    One row_number window per stratum (keyed shuffle) + a broadcast of
    per-stratum counts; integer comparisons only.

    Output: ``id_col, strata_col, split`` ∈ {train, val, test}.
    """
    from pyspark.sql import Window

    if not (0 < train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError("need 0 < train_pct, 0 <= val_pct, sum <= 100")
    rn = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
    )
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    ranked = df.select(strata_col, id_col).withColumn("__rn", rn).join(
        F.broadcast(counts), strata_col
    )
    n_train = F.expr(f"__n * {train_pct} DIV 100")
    n_val = F.expr(f"__n * {train_pct + val_pct} DIV 100")
    return ranked.select(
        id_col,
        strata_col,
        F.when(F.col("__rn") <= n_train, F.lit("train"))
        .when(F.col("__rn") <= n_val, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def rendezvous_assign(df, id_col: str, n_shards: int, shard_col: str = "shard"):
    """Rendezvous (highest-random-weight) shard assignment.

    ``shard = argmax over s∈[0,n_shards) of md5(id ‖ '|' ‖ s)`` — the
    placement rule (Thaler & Ravishankar 1998) whose defining property
    is resharding stability: growing to ``n+1`` shards moves ONLY the
    rows whose (n+1)-th weight is the new global max (≈ 1/(n+1) of
    them), and every moved row lands on the NEW shard.  Contrast with
    ``id % n``, which reshuffles almost everything.

    Purely map-side: the per-row candidate list is built with
    ``transform(sequence(...))`` and reduced with ``array_max`` over
    ``(weight, shard)`` structs — no explode, no shuffle, no state.
    The weight is the first 60 bits of ``md5(CAST(id AS STRING) || '|'
    || s)``, the engine's md5-literal idiom, so a DuckDB oracle can
    reproduce the assignment bit-for-bit.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    cands = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.struct(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(id_col).cast("string"),
                            F.lit("|"),
                            s.cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("w"),
            s.cast("long").alias("s"),
        ),
    )
    return df.withColumn(shard_col, F.array_max(cands)["s"])


def negative_sample(
    positives,
    user_col: str,
    item_col: str,
    n_items: int,
    k: int,
    oversample: int = 3,
):
    """Deterministic hash-probe negative sampling for training pairs.

    For every user with at least one positive, propose ``k·oversample``
    candidate items ``md5(user ‖ ':' ‖ slot) % n_items``, drop
    collisions with the user's positives (and duplicate proposals,
    keeping the lowest slot), and keep the first ``k`` surviving slots.
    The recsys/contrastive-training move — but md5-stable, so the same
    (user, slot) always proposes the same item: resumable shards
    regenerate identical negatives with zero persisted state, the same
    contract the deterministic samplers above honor.

    Never materializes user×item: the candidate frame is |users|·k·
    oversample rows (one ``transform(sequence)`` + explode, map-side),
    then ONE anti-join on (user, item) and one per-user window.  A user
    whose positives swallow too many proposals yields fewer than ``k``
    rows — callers see the true count rather than a silent refill (the
    no-silent-caps rule); raise ``oversample`` to push the shortfall
    probability down geometrically.

    Returns ``{user_col}, {item_col}, slot`` with ≤ k rows per user.
    """
    from pyspark.sql import Window

    if not (n_items > 0 and k > 0 and oversample >= 1):
        raise ValueError("need n_items > 0, k > 0, oversample >= 1")
    u = positives.select(user_col).distinct()
    slots = F.explode(
        F.sequence(F.lit(0), F.lit(k * oversample - 1))
    ).alias("slot")
    cand = u.select(user_col, slots).select(
        user_col,
        "slot",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(user_col).cast("string"),
                            F.lit(":"),
                            F.col("slot").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % n_items
        ).alias(item_col),
    )
    # same item proposed twice for one user → keep the earliest slot
    first = cand.groupBy(user_col, item_col).agg(
        F.min("slot").alias("slot")
    )
    neg = first.join(
        positives.select(user_col, item_col).distinct(),
        [user_col, item_col],
        "left_anti",
    )
    w = Window.partitionBy(user_col).orderBy("slot")
    return (
        neg.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(user_col, item_col, "slot")
    )


def coordinated_sample(
    df, join_key: str, fraction: float, buckets: int = 10_000
):
    """Join-consistent (coordinated) sample: filter on the JOIN KEY's
    stable hash bucket, not the row id.

    Debug subsets of a 100 TB star schema are useless if sampled fact
    rows lose their dimension partners; sampling every table by the
    SAME hash of the SAME join key guarantees the identity
    ``sample(A) ⋈ sample(B) = sample(A ⋈ B)`` — exactly, not in
    expectation — because a key is either wholly in or wholly out on
    every side.  This is :func:`deterministic_sample`'s mask applied
    to a foreign key; the wrapper exists to name the contract (and the
    q285 oracle proves the identity by computing the OTHER side of
    it).  Purely map-side; composes with partition pruning.
    """
    return df.filter(deterministic_sample(join_key, fraction, buckets))


def curriculum_interleave(
    df,
    bucket_col: str,
    order_by,
    id_col: str,
    per_bucket: int | None = None,
):
    """Curriculum ordering: round-robin interleave across difficulty
    buckets — emit every bucket's best item first, then every bucket's
    second, … so a training run sees a difficulty mix from step one
    instead of an easy-first wall (the standard curriculum/data-mixing
    layout step).

    ``bucket_col`` is a caller-supplied difficulty bucket (an explicit
    expression or precomputed decile — NOT inferred here: global
    quantile inference is its own operator and would hide a global
    sort inside a layout primitive).  Within each bucket items rank by
    ``(order_by, id)`` — a PARTITIONED window, the only shuffle.  The
    interleave position is computed arithmetically from
    ``(within_rank, bucket_rank)`` — no global window; materializing
    the final order is the consumer's ``orderBy(interleave_pos)``,
    which Spark executes as a distributed range-partitioned sort.

    ``per_bucket`` caps each bucket (curriculum head); ``None`` keeps
    everything.  Buckets are dense-ranked by their value so gaps in
    bucket ids don't leave holes in the interleave.

    Returns input columns + ``within_rank, bucket_rank,
    interleave_pos`` (0-based; ``pos = (within_rank-1) * n_buckets +
    bucket_rank - 1``).
    """
    from pyspark.sql import Window

    wb = Window.partitionBy(bucket_col).orderBy(
        *(order_by if isinstance(order_by, (list, tuple)) else [order_by]),
        F.asc(id_col),
    )
    ranked = df.withColumn("within_rank", F.row_number().over(wb))
    if per_bucket is not None:
        ranked = ranked.filter(F.col("within_rank") <= per_bucket)
    buckets = (
        ranked.select(bucket_col)
        .distinct()
        .groupBy()
        .agg(
            F.sort_array(F.collect_list(bucket_col)).alias("__bs"),
            F.count(F.lit(1)).alias("__nb"),
        )
    )
    return (
        ranked.crossJoin(F.broadcast(buckets))
        .withColumn(
            "bucket_rank",
            F.array_position(F.col("__bs"), F.col(bucket_col)).cast("int"),
        )
        .withColumn(
            "interleave_pos",
            (F.col("within_rank") - 1) * F.col("__nb")
            + F.col("bucket_rank")
            - 1,
        )
        .drop("__bs", "__nb")
    )


def dsir_weights(
    candidates,
    target,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    scale: int = 1_000_000,
):
    """Data Selection via Importance Resampling weights (Xie et al.,
    NeurIPS'23): score each candidate document by how target-like its
    hashed char-trigram profile is,

        w(d) = Σ_f  c_f(d) · ln( p̂_target(f) / p̂_candidates(f) ),

    with add-one-smoothed bucket probabilities.  The standard cheap
    data-selection step before pretraining: keep/up-weight the
    candidates whose feature mix matches a small trusted target
    corpus.

    Exactness: the per-bucket log-ratio decomposes into FOUR integer
    logs, ln(c_t+1) − ln(T+B) − ln(c_s+1) + ln(S+B), each computed
    with ``portable_ln`` (libm-free, engine-exact) and the combination
    QUANTIZED to integer ``scale`` units per bucket before the per-doc
    weighted sum — so the sum is order-free and any engine agrees
    bit-for-bit.  Report ``weight_units / scale``; compare on units.

    Plan: one trigram explode + bucket groupBy per corpus (the bucket
    table is ``n_buckets`` rows — broadcast), then per-candidate
    bucket counts joined against the broadcast log-ratio table and
    summed.  Two data-sized shuffles (the per-corpus bucket counts and
    the per-doc re-agg); the target corpus is small by construction.
    At 100 TB nothing driver-side grows past ``n_buckets`` rows.

    Returns ``(id_col, n_grams, weight_units)`` for every candidate
    with ≥ 1 trigram.
    """
    from db_factfinder_spark.functions.expr import let
    from db_factfinder_spark.functions.portable_math import portable_ln
    from db_factfinder_spark.llmdata.dedup import _md5_long28
    from db_factfinder_spark.llmdata.textstats import normalize_text

    def grams(df):
        # let-bind the normalized text so the per-gram lambda slices a
        # MATERIALIZED string instead of re-running the normalize
        # regexes per gram (the O(len²) inlining trap shingles() and
        # _winnow_fps document)
        def over_t(t: Column) -> Column:
            n = F.length(t)
            idx = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(0)))
            return F.when(
                n >= 3,
                F.transform(idx, lambda i: t.substr(i, F.lit(3))),
            ).otherwise(F.array().cast("array<string>"))

        return df.select(
            F.col(id_col),
            F.explode(
                let(normalize_text(F.col(text_col)), over_t)
            ).alias("gram"),
        ).withColumn(
            "bucket", _md5_long28(F.col("gram")) % F.lit(n_buckets)
        )

    cand_g = grams(candidates)
    tgt_g = grams(target)
    c_src = cand_g.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_s"))
    c_tgt = tgt_g.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t"))
    tot_s = c_src.agg(F.sum("c_s").alias("s_tot"))
    tot_t = c_tgt.agg(F.sum("c_t").alias("t_tot"))
    buckets = (
        candidates.sparkSession.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(c_src, "bucket", "left")
        .join(c_tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot_s))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "bucket",
            F.floor(
                (
                    portable_ln(F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                    - portable_ln(F.col("t_tot") + F.lit(n_buckets))
                    - portable_ln(F.coalesce(F.col("c_s"), F.lit(0)) + 1)
                    + portable_ln(F.col("s_tot") + F.lit(n_buckets))
                )
                * F.lit(float(scale))
                + F.lit(0.5)
            ).cast("long").alias("lr_units"),
        )
    )
    per_doc = cand_g.groupBy(F.col(id_col), "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_doc.join(F.broadcast(buckets), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("lr_units")).cast("long").alias(
                "weight_units"
            ),
        )
    )
