"""Engine-portable deterministic sketches.

Native approximate aggregates (``approx_count_distinct``,
``percentile_approx``) are engine-specific: Spark's HLL++ and DuckDB's
HLL give different answers on identical data, so a cross-engine
pipeline can't reconcile their outputs and an external oracle can't
check them.  This module builds the sketch from *portable* primitives
— md5-derived hashes, integer bit math, and IEEE doubles with a fixed
operation order — so ANY engine (and the SQL oracle) derives the
bit-identical estimate.

Scale shape: the classic HLL trade.  Exact ``count_distinct`` shuffles
every distinct key; the sketch shuffles at most ``m`` (bucket, max-
rank) partials per group — constant per group, regardless of
cardinality — and composes under union by bucket-wise max, so partial
aggregation (map-side combine) does almost all the work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# alpha_m · m² for m=64 (HLL bias constant 0.709), written as the
# decimal literal both engines parse to the same double
_M = 64
_ALPHA_M2 = "2904.064"


def sampled_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    sample_id: Column | str,
    fraction: float = 0.1,
    buckets: int = 10_000,
) -> DataFrame:
    """Engine-portable approximate quantiles: exact linearly-
    interpolated percentiles over a DETERMINISTIC md5-selected sample.
    Native sketches (t-digest / ``percentile_approx`` / DuckDB's
    approx_quantile) are engine-specific and can't be cross-checked;
    hash-sampling + exact percentile is reproducible anywhere — the
    sample is a pure function of ``sample_id`` (REQUIRED, and it must
    be row-unique: keying the sample on a non-unique column — worst,
    the value itself — turns it into all-or-nothing selection of
    whole value classes, with unbounded error on skewed data), and
    q59 established
    that Spark's ``percentile`` and DuckDB's ``quantile_cont`` agree
    bit-for-bit on identical doubles.

    Scale shape: only the ~``fraction`` sample shuffles and sorts;
    the full-data exact percentile sorts everything.  Standard
    order-statistic bounds apply (ε ≈ 1/√(f·n) rank error).
    """
    from db_factfinder_spark.llmdata.sampling import deterministic_sample

    sid = F.col(sample_id) if isinstance(sample_id, str) else sample_id
    sampled = df.filter(deterministic_sample(sid, fraction, buckets))
    arr = ", ".join(repr(p) for p in probs)
    aggs = [
        F.expr(f"percentile({value_col}, array({arr}))").alias("__q"),
        F.count(F.lit(1)).alias("n_sampled"),
    ]
    out = sampled.groupBy(*group_cols).agg(*aggs)
    return out.select(
        *group_cols,
        *[
            F.get("__q", i).alias(f"q{int(p * 100)}")
            for i, p in enumerate(probs)
        ],
        "n_sampled",
    )


def hll_bucket_rank(col: Column | str) -> tuple[Column, Column]:
    """(bucket, rank) for one value: bucket = 28 md5 bits mod m,
    rank = 1 + leading zeros of an independent 28-bit md5 field
    (via ``29 - length(bin(h))`` — h=0, probability 2⁻²⁸, yields 28
    instead of 29 on every engine equally, a deterministic and
    negligible bias).  Pure expressions, map-side."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    h1 = F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(s), 8, 7), 16, 10).cast("long")
    bucket = h1 % _M
    rank = F.lit(29) - F.length(F.bin(h2))
    return bucket, rank


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Raw HLL cardinality estimate of ``value_col`` per group:
    ``raw = α·m² / (Σ_present 2^(−M_j) + (m − present)·1)``.

    Every 2^(−M) is an exact power of two and the partial sums stay
    within the double mantissa, so the sum is EXACT and order-
    independent — no decimal casts needed, and any engine computing
    the same formula agrees bit-for-bit.  Emits the estimate plus the
    (present-bucket, zero-bucket) split so callers can apply the
    standard small/large-range corrections (kept out of the sketch:
    they need ``ln``, whose last bit is libm-specific).

    Two shuffles, both tiny: (group, bucket) max-rank partials — at
    most m rows per group — then the per-group fold."""
    bucket, rank = hll_bucket_rank(value_col)
    partials = (
        # NULLs don't count toward cardinality (count_distinct
        # semantics) — unfiltered they'd form a phantom NULL bucket
        # that inflates n_buckets without contributing rank mass
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bucket.alias("__bucket"), rank.alias("__rank"))
        .groupBy(*group_cols, "__bucket")
        .agg(F.max("__rank").alias("__m"))
    )
    # shiftleft's Python binding takes only literal shift amounts —
    # the SQL form accepts the column
    inv = F.lit(1.0) / F.expr("shiftleft(1, __m)").cast("double")
    return (
        partials.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(inv).alias("__sum_present"),
        )
        .select(
            *group_cols,
            "n_buckets",
            (
                F.lit(float(_ALPHA_M2))
                / (
                    F.col("__sum_present")
                    + (F.lit(_M) - F.col("n_buckets")).cast("double")
                )
            ).alias("hll_raw"),
        )
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10
) -> DataFrame:
    """EXACT frequent items above the n/(k+1) threshold, found with a
    Misra–Gries candidate pass so the full-cardinality groupBy never
    runs.

    Two passes:

    1. per-partition Misra–Gries with ``k`` counters (streamed over
       Arrow batches via ``mapInPandas``).  Guarantee: any item with
       partition frequency > n_p/(k+1) survives its partition summary;
       an item with GLOBAL frequency > n/(k+1) must exceed the local
       threshold in ≥1 partition (otherwise Σ counts ≤ n/(k+1)), so
       the union of partition candidates is a superset of every global
       heavy hitter.  Each partition emits ≤ k rows — the candidate
       frame is tiny no matter the input size.
    2. exact counts of candidate items only (semi-join then groupBy on
       a ≤ k·P key set), filtered by ``count·(k+1) > n`` (integer
       arithmetic, no float threshold).

    At 100 TB this replaces a full-cardinality count shuffle (which
    for, say, URLs is nearly |input| keys) with one map-side sketch +
    one shuffle over a bounded candidate set.  NULLs are excluded
    (they are not an "item").

    Output: ``item string, n_item bigint, n_total bigint``.
    """
    import pandas as pd

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf["item"]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all: drop zeros
                    counters = {
                        key: c - 1 for key, c in counters.items() if c > 1
                    }
        yield pd.DataFrame({"item": list(counters.keys())})

    items = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    cands = items.mapInPandas(mg, "item string").distinct()
    counted = (
        items.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    total = items.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("n_item") * (k + 1) > F.col("n_total"))
        .select("item", "n_item", "n_total")
    )


def _cm_pairs(k: Column, depth: int, width: int) -> Column:
    """array<struct<__row,__bucket>> — one (row, bucket) per hash row
    for one key.  Row r's bucket is the first 28 md5 bits of the
    row-salted key mod width; the salt prefix makes the rows pairwise
    independent in the md5 sense while staying one-expression portable."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("__row"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"cm{r}|"), k)), 1, 7
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("__bucket"),
            )
            for r in range(depth)
        ]
    )


def countmin_partials(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Mergeable Count–Min sketch state (Cormode & Muthukrishnan,
    J. Algorithms 2005): ``depth`` independent hash rows of ``width``
    counters; every occurrence of a key increments one counter per
    row.  Row hashes are md5 of a row-salted key (portable: DuckDB
    ``('0x' || substr(md5('cm<r>|' || key), 1, 7))::BIGINT % width``),
    so ANY engine — and the SQL oracle — derives the identical sketch.

    Output: ``(__row, __bucket, __cnt)`` — exactly depth·width
    counters whatever the input size, which is the point: the sketch
    shuffles a CONSTANT frame, composes under union by counter-wise
    sum (algebraic → map-side partial aggregation does almost all the
    work), and is the frame a 100 TB pipeline persists per batch so
    frequency queries never rescan raw data.

    Plan shape: one explode (×depth, map-side) + one groupBy on
    (row, bucket) whose key space is depth·width — the shuffle moves
    at most depth·width rows per map partition.  NULL keys are
    excluded (not an "item", matching heavy_hitters).
    """
    k = F.col(key_col).cast("string")
    pairs = _cm_pairs(k, depth, width)
    return (
        df.filter(k.isNotNull())
        .select(F.explode(pairs).alias("__p"))
        .select("__p.__row", "__p.__bucket")
        .groupBy("__row", "__bucket")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def countmin_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a Count–Min sketch: for each key
    in ``keys``, est = min over rows of the counter the key hashes to.
    The classic CMS guarantee holds deterministically here: est ≥ true
    count always (counters only over-count), and collisions are a pure
    function of the md5 row hashes, so the estimate is reproducible on
    any engine.

    The sketch (depth·width rows) broadcasts; the probe side explodes
    ×depth, equi-joins on (row, bucket) map-side, and folds back with
    a min — one shuffle on the probe keys only.  Keys absent from the
    sketch still collide into some counter, so the join is inner and
    always matches (every bucket that a key hashes to may legitimately
    hold 0 only if no key ever touched it — then the sketch has no row
    and the true count is 0; a left join + coalesce(0) keeps those).
    """
    k = F.col(key_col).cast("string")
    pairs = _cm_pairs(k, depth, width)
    probes = keys.select(
        F.col(key_col), F.explode(pairs).alias("__p")
    ).select(key_col, "__p.__row", "__p.__bucket")
    return (
        probes.join(F.broadcast(sketch), ["__row", "__bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("__cnt"), F.lit(0))).alias("cm_est"))
    )


def hll_partials(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Mergeable HLL state per group: (group_cols…, __bucket, __m).
    At most m rows per group whatever the input size — this is the
    frame a 100 TB pipeline PERSISTS (per day / per partition) so
    coarser periods never rescan raw data."""
    bucket, rank = hll_bucket_rank(value_col)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bucket.alias("__bucket"), rank.alias("__rank"))
        .groupBy(*group_cols, "__bucket")
        .agg(F.max("__rank").alias("__m"))
    )


def hll_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge persisted HLL states down to ``group_cols`` and estimate.
    Sketch merge is bucket-wise max — ALGEBRAIC, so estimates from
    merged partials are bit-identical to a direct sketch of the union
    (the q126 oracle proves it: the SQL side sketches the raw data
    directly).  Same exactness argument as ``hll_distinct``: every
    2^(−M) term and the fold are exact in doubles."""
    merged = partials.groupBy(*group_cols, "__bucket").agg(
        F.max("__m").alias("__m")
    )
    inv = F.lit(1.0) / F.expr("shiftleft(1, __m)").cast("double")
    return (
        merged.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(inv).alias("__sum_present"),
        )
        .select(
            *group_cols,
            "n_buckets",
            (
                F.lit(float(_ALPHA_M2))
                / (
                    F.col("__sum_present")
                    + (F.lit(_M) - F.col("n_buckets")).cast("double")
                )
            ).alias("hll_raw"),
        )
    )


def hll_intersect(
    df: DataFrame,
    group_a,
    group_b,
    value_col: str,
) -> DataFrame:
    """Estimated |A ∩ B| of two sliced populations via
    inclusion–exclusion over the portable HLL sketch: |A∩B| ≈
    |A| + |B| − |A∪B|, where all three cardinalities come from the
    SAME bucket partials (the union sketch is the bucket-wise max of
    the slice sketches — sketch algebra, no rescan of raw data).
    Standard caveat applies and is part of the contract: the
    difference of estimates amplifies relative error when the true
    intersection is small — use it for overlap TRIAGE (which day
    pairs / domain pairs share audiences), not billing.

    ``group_a`` / ``group_b`` are boolean Columns selecting the two
    slices.  One pass over the data builds both slice partials
    (filter inside the aggregation, not two scans); the three folds
    run over at most 2·m bucket rows.

    Output: one row — ``est_a, est_b, est_union, est_intersect``
    (raw HLL estimates, exact-arithmetic portable like hll_distinct).
    """
    bucket, rank = hll_bucket_rank(value_col)
    tagged = df.filter(F.col(value_col).isNotNull()).select(
        bucket.alias("__bucket"),
        rank.alias("__rank"),
        group_a.alias("__a"),
        group_b.alias("__b"),
    )
    partials = tagged.groupBy("__bucket").agg(
        F.max(F.when(F.col("__a"), F.col("__rank"))).alias("__ma"),
        F.max(F.when(F.col("__b"), F.col("__rank"))).alias("__mb"),
    )

    inv = lambda c: F.lit(1.0) / F.expr(  # noqa: E731
        f"shiftleft(1, {c})"
    ).cast("double")
    folded = partials.agg(
        F.count(F.col("__ma")).alias("__na"),
        F.sum(F.when(F.col("__ma").isNotNull(), inv("__ma"))).alias("__sa"),
        F.count(F.col("__mb")).alias("__nb"),
        F.sum(F.when(F.col("__mb").isNotNull(), inv("__mb"))).alias("__sb"),
        F.count(
            F.when(F.col("__ma").isNotNull() | F.col("__mb").isNotNull(), 1)
        ).alias("__nu"),
        F.sum(
            F.when(
                F.col("__ma").isNotNull() | F.col("__mb").isNotNull(),
                inv("greatest(coalesce(__ma, 0), coalesce(__mb, 0))"),
            )
        ).alias("__su"),
    )
    est = lambda s, n: F.lit(float(_ALPHA_M2)) / (  # noqa: E731
        F.coalesce(F.col(s), F.lit(0.0))
        + (F.lit(_M) - F.col(n)).cast("double")
    )
    return folded.select(
        est("__sa", "__na").alias("est_a"),
        est("__sb", "__nb").alias("est_b"),
        est("__su", "__nu").alias("est_union"),
        (
            est("__sa", "__na")
            + est("__sb", "__nb")
            - est("__su", "__nu")
        ).alias("est_intersect"),
    )


def rolling_hll_distinct(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window distinct estimate per day (7-day rolling
    uniques, the growth-dashboard staple) from DAILY HLL PARTIALS:
    raw data is scanned once into (day, bucket, max-rank) rows — at
    most m per day — and every trailing window is a bucket-wise max
    over ≤ window·m partial rows.  The naive form re-counts distinct
    over each window, rescanning ``window_days`` of raw data per day;
    this is the persist-the-sketch pattern (hll_partials/hll_merge)
    applied to time.

    The day↔partials range join is days × (window·m) rows — driver-
    trivial at any corpus size; merge exactness is the usual
    power-of-two-sum argument, so the oracle reproduces every
    estimate bit-for-bit.

    Output: ``day, n_buckets, hll_raw`` — one row per active day,
    estimating distinct ``value_col`` over (day − window_days, day].
    """
    daily = df.filter(F.col(ts_col).isNotNull()).withColumn(
        "__day", F.to_date(ts_col)
    )
    partials = hll_partials(daily, ["__day"], value_col)
    days = partials.select(F.col("__day").alias("day")).distinct()
    in_window = partials.join(
        days,
        (F.col("__day") <= F.col("day"))
        & (F.col("__day") > F.date_sub(F.col("day"), window_days)),
    )
    merged = in_window.groupBy("day", "__bucket").agg(
        F.max("__m").alias("__m")
    )
    inv = F.lit(1.0) / F.expr("shiftleft(1, __m)").cast("double")
    return (
        merged.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(inv).alias("__sum_present"),
        )
        .select(
            "day",
            "n_buckets",
            (
                F.lit(float(_ALPHA_M2))
                / (
                    F.col("__sum_present")
                    + (F.lit(_M) - F.col("n_buckets")).cast("double")
                )
            ).alias("hll_raw"),
        )
    )


# ---------------------------------------------------------------- KMV

_KMV_RANGE = "1152921504606846976.0"  # 2^60 as an exact double literal


def _kmv_hash(value: Column) -> Column:
    """60-bit uniform hash: first 15 md5 hex chars as int64 — the
    repo-standard portable idiom (DuckDB:
    ``('0x' || substr(md5(v), 1, 15))::BIGINT``)."""
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable k-minimum-values state: per (group, shard), the
    sorted array of the k SMALLEST distinct 60-bit hashes of
    ``value_col`` — at most k int64s per shard whatever the input
    cardinality.  This is the KMV/theta-sketch counterpart to
    ``hll_partials``: same persist-per-day / merge-later story, but
    the state also supports set operations (intersection via the
    common k-min domain) and gives an unbiased (k-1)/h_k estimator.

    Shape at 100 TB: one distinct-shuffle on (group, shard, hash),
    then a per-group-shard sort bounded by row_number ≤ k — the heavy
    frame never leaves the executors and the emitted state is k ints
    per shard."""
    keys = list(group_cols) + list(shard_cols or [])
    dedup = (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, _kmv_hash(F.col(value_col)).alias("__hv"))
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy("__hv")
    return (
        dedup.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("__hv")).alias("kmins"))
    )


def kmv_merge(
    partials: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge KMV states down to ``group_cols``: union the hash sets,
    drop duplicates (the same value hashes identically in every
    shard), keep the k smallest.  ALGEBRAIC — merged state is
    bit-identical to a direct sketch of the unioned data, which is
    exactly what the q241 oracle proves by sketching the raw rows."""
    return (
        partials.groupBy(*group_cols)
        .agg(F.flatten(F.collect_list("kmins")).alias("__all"))
        .select(
            *group_cols,
            F.slice(
                F.array_sort(F.array_distinct("__all")), 1, k
            ).alias("kmins"),
        )
    )


def kmv_estimate(state: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count readout of a KMV state: exact size when the
    group holds fewer than k distinct values (the sketch IS the value
    set), else (k-1) · 2^60 / h_k — every operand an exact double, one
    multiply and one divide in a fixed order, so the estimate is
    engine-reproducible."""
    n_kept = F.size("kmins")
    kth = F.element_at("kmins", k).cast("double")
    est = F.when(n_kept < k, n_kept.cast("double")).otherwise(
        F.lit(float(k - 1))
        * float(_KMV_RANGE)
        / kth
    )
    return state.select(
        "*",
        n_kept.cast("long").alias("n_kept"),
        F.element_at("kmins", F.least(n_kept, F.lit(k))).alias("kth_hash"),
        est.alias("est_distinct"),
    ).drop("kmins")


def kmv_intersect(
    df: DataFrame,
    group_a: Column,
    group_b: Column,
    value_col: str,
    k: int = 64,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Estimated |A ∩ B| of two sliced populations from KMV state —
    the set operation HLL's union-only algebra cannot do directly.
    Standard KMV intersection (Beyer et al., SIGMOD'07): with both
    slices hashed by the SAME function, take U = the k smallest
    distinct hashes of A ∪ B; the fraction ρ of U that lies in both
    slices' own k-min sets is an unbiased Jaccard estimate, and
    |A∩B| ≈ ρ · |A∪B|.

    Scale shape: ONE distinct-shuffle on the hash builds the
    membership frame (hash, in_a, in_b), materialized once; the three
    k-min sets come from ``orderBy().limit(k)`` — Spark plans
    TakeOrderedAndProject, the distributed top-k (per-partition heaps
    + a k-row driver merge), NEVER a single-partition sort or window.
    The ≤k-row slice sets broadcast back onto U, and the readout is a
    one-row fold crossed with two one-row counts (the scalar-
    broadcast idiom).  Counts exact; the last two arithmetic steps
    are a fixed-order double expression — engine-reproducible.

    Output: one row — ``n_a, n_b, n_union_kept, n_common, est_union,
    est_intersect`` (estimates exact below k by the kmv_estimate
    rule).
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    member = materialize(
        df.filter(F.col(value_col).isNotNull())
        .filter(group_a | group_b)
        .select(
            _kmv_hash(F.col(value_col)).alias("hv"),
            group_a.alias("__a"),
            group_b.alias("__b"),
        )
        .groupBy("hv")
        .agg(
            F.max("__a").alias("__a"),
            F.max("__b").alias("__b"),
        ),
        checkpoint_mode,
    )
    u = member.orderBy("hv").limit(k)
    a_k = (
        member.filter("__a").orderBy("hv").limit(k)
        .select(F.col("hv").alias("hv_a"))
    )
    b_k = (
        member.filter("__b").orderBy("hv").limit(k)
        .select(F.col("hv").alias("hv_b"))
    )
    u2 = u.join(
        F.broadcast(a_k), F.col("hv") == F.col("hv_a"), "left"
    ).join(F.broadcast(b_k), F.col("hv") == F.col("hv_b"), "left")
    fold = u2.agg(
        F.count(F.lit(1)).alias("n_union_kept"),
        F.sum(
            (F.col("hv_a").isNotNull() & F.col("hv_b").isNotNull())
            .cast("long")
        ).alias("n_common"),
        F.max("hv").alias("__hk"),
    )
    na = a_k.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b_k.agg(F.count(F.lit(1)).alias("n_b"))
    folded = fold.crossJoin(F.broadcast(na)).crossJoin(F.broadcast(nb))
    est_union = F.when(
        F.col("n_union_kept") < k, F.col("n_union_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        * float(_KMV_RANGE)
        / F.col("__hk").cast("double")
    )
    return folded.select(
        "n_a",
        "n_b",
        "n_union_kept",
        "n_common",
        est_union.alias("est_union"),
        (
            F.col("n_common").cast("double")
            * est_union
            / F.lit(float(k))
        ).alias("est_intersect"),
    )
