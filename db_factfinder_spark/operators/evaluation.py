"""Model-evaluation statistics as exact distributed aggregations.

AUC (area under the ROC curve) equals the Mann–Whitney U statistic
normalised by n_pos·n_neg — the probability a random positive
outscores a random negative, with ties counted half.  The naive
computation ranks every row through one ``row_number() OVER (ORDER BY
score)`` task (the single-partition-window scale-killer), or worse,
compares all pos×neg pairs.  Here the rank pass runs over DISTINCT
scores per group: one groupBy on (group, score) collapses the table
to its score histogram, and the cumulative window that assigns
tied-average ranks orders only that (bounded) histogram.

All rank arithmetic is ×2-scaled to stay in exact integers — the
tied-average rank of a run [lo..hi] is (lo+hi)/2, so twice it,
2·cum_before + cnt + 1, is always integral — and the single IEEE
division at the end makes the statistic bit-reproducible on any
engine (the same exactness rule as functions/stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "calibration_bins",
    "decile_gains",
    "grouped_auc",
    "isotonic_fit",
    "sprt_decision",
]


def grouped_auc(
    df: DataFrame,
    group_cols: list[str],
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Exact tie-corrected AUC of ``score_col`` against the boolean
    ``label_col``, per group.

    Mann–Whitney with tied-average ranks:

        rank-sum₂(pos) = Σ_scores pos_cnt · (2·cum_before + cnt + 1)
        AUC = (rank-sum₂(pos) − n_pos·(n_pos+1)) / (2·n_pos·n_neg)

    where ``cum_before`` is the row count strictly below the score.
    Rows with a NULL label or score are ignored.  Groups with only
    one class present get a NULL ``auc`` (the statistic is
    undefined), never a division error.

    Plan: one shuffle to the per-(group, score) histogram; a
    cumulative window over the histogram ordered by score (partition
    = group, rows = distinct scores — bounded, not table-sized); one
    final groupBy back to the group grain.  Scores can be any
    orderable type; integer scores (cents) keep every intermediate
    exact.

    Output: ``group_cols…, n_pos, n_neg, auc``.
    """
    valid = df.filter(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    )
    hist = valid.groupBy(*group_cols, score_col).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos_cnt"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.withColumn(
        "avg_rank2",
        2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
        + F.col("cnt")
        + F.lit(1),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.sum("pos_cnt").cast("long").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos_cnt")).cast("long").alias("n_neg"),
        F.sum(F.col("pos_cnt") * F.col("avg_rank2"))
        .cast("long")
        .alias("ranksum2"),
    )
    defined = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.when(
            defined,
            (
                F.col("ranksum2") - F.col("n_pos") * (F.col("n_pos") + 1)
            ).cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("auc"),
    )


def decile_gains(
    df: DataFrame,
    label_col: str,
    score_col: str,
    tiebreak_col: str,
    n_buckets: int = 10,
    partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Cumulative-gains (lift) table: rank the population by score
    descending, cut it into ``n_buckets`` equal-count buckets, and
    report each bucket's positive rate plus the cumulative share of
    ALL positives captured down to that bucket — the model-quality
    readout campaign targeting reads ("the top decile captures X% of
    conversions").

    The ranking reuses ``global_rank`` (range-repartition + offset
    broadcast), so no single-partition ORDER BY window anywhere;
    descending order falls out of ranking ascending on the NEGATED
    long score (exact for longs) with the tiebreak ascending.  Bucket
    assignment is pure integer arithmetic, ``(rank−1)·n_buckets div
    N``, against the one-row population count broadcast by crossJoin
    (the repo's scalar-total idiom); the cumulative window then runs
    over the ``n_buckets``-row aggregate, never the population.

    Output: ``bucket (0 = best), n_rows, n_pos, pos_rate, cum_gain``
    — both ratios exact-int divisions.
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize
    from db_factfinder_spark.operators.ranking import global_rank

    src = df.select(
        F.col(label_col).cast("long").alias("__y"),
        (-F.col(score_col).cast("long")).alias("__neg"),
        F.col(tiebreak_col).alias("__tb"),
    )
    ranked = materialize(
        global_rank(
            src,
            ["__neg", "__tb"],
            partitions=partitions,
            checkpoint_mode=checkpoint_mode,
        ),
        checkpoint_mode,
    )
    n_total = ranked.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    buckets = (
        ranked.crossJoin(F.broadcast(n_total))
        .select(
            F.expr(f"(rank - 1L) * {n_buckets}L div __N").alias("bucket"),
            "__y",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__y").cast("long").alias("n_pos"),
        )
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return buckets.select(
        "bucket",
        "n_rows",
        "n_pos",
        (F.col("n_pos").cast("double") / F.col("n_rows").cast("double"))
        .alias("pos_rate"),
        F.when(
            F.sum("n_pos").over(w_all) > 0,
            F.sum("n_pos").over(w_cum).cast("double")
            / F.sum("n_pos").over(w_all).cast("double"),
        ).alias("cum_gain"),
    )


def calibration_bins(
    df: DataFrame,
    group_cols: list[str],
    score28_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins + per-bin Brier score for a
    probability model, computed entirely in exact arithmetic.

    The score is a 28-bit integer ``h`` (probability = h/2^28 — a
    dyadic rational, so the implied double is exact; q206/q243 derive
    it from md5 as the deterministic model-score stand-in).  Per
    (group, bin = h·bins div 2^28):

    * ``n``, ``n_pos`` — exact counts;
    * ``mean_p`` — Σh as exact int, ONE division cascade at the end;
    * ``frac_pos`` — calibration target, one division;
    * ``brier`` — each squared error (h − y·2^28)² fits int64 (≤ 2^56)
      but their SUM does not stay below 2^53, and a wide-integer →
      double conversion is the one place engines legally disagree by
      an ulp (measured: Spark DECIMAL(38,0)→double vs DuckDB
      HUGEINT→double differ at sf0.1).  So the square is split per
      row into ``se div 2^28`` and ``se mod 2^28`` — both sums stay
      exact int64 doubles — and recombined as the fixed-order double
      expression ``sum_q/(n·2^28) + sum_r/(n·2^56)``: every operand
      exact, every operation identical in any engine.

    Every aggregation is an integer sum — order-independent, spill-
    safe, and bit-identical in any engine; the handful of IEEE
    divisions happen once per OUTPUT row in a fixed order.  One
    groupBy, map-side partials do the work.  A well-calibrated model
    shows mean_p ≈ frac_pos per bin; Brier decomposes over the same
    bins — this is the monitoring readout behind "is the ranker's
    0.9 really a 0.9".
    """
    two28 = 268_435_456  # 2^28
    h = F.col(score28_col).cast("long")
    y = F.col(label_col).cast("long")
    d = h - y * F.lit(two28)
    se = d * d
    binc = F.expr(f"({score28_col} * {bins}) div {two28}").alias("bin")
    g = (
        df.select(
            *group_cols, binc, h.alias("__h"), y.alias("__y"),
            se.alias("__se"),
        )
        .select(
            *group_cols, "bin", "__h", "__y",
            F.expr(f"__se div {two28}").alias("__se_q"),
            (F.col("__se") % F.lit(two28)).alias("__se_r"),
        )
        .groupBy(*group_cols, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").alias("n_pos"),
            F.sum("__h").alias("__sum_h"),
            F.sum("__se_q").alias("__sum_q"),
            F.sum("__se_r").alias("__sum_r"),
        )
    )
    nd = F.col("n").cast("double")
    return g.select(
        *group_cols,
        "bin",
        "n",
        "n_pos",
        (
            F.col("__sum_h").cast("double") / nd / F.lit(float(two28))
        ).alias("mean_p"),
        (F.col("n_pos").cast("double") / nd).alias("frac_pos"),
        (
            F.col("__sum_q").cast("double") / (nd * F.lit(float(two28)))
            + F.col("__sum_r").cast("double")
            / (nd * F.lit(72_057_594_037_927_936.0))  # 2^56
        ).alias("brier"),
    )


def reference_percentile_grid(
    ref, value_col: str, id_col: str, points: int = 20
):
    """Exact rank-based percentile grid from a reference corpus.

    ``(p, gv)`` for p = 0..points: ``gv`` is the value at 1-based rank
    ``1 + (n−1)·p DIV points`` under the (value, id) total order — the
    min at p=0, the max at p=points, no interpolation floats anywhere.
    This is the train-time half of train/serve drift monitoring: the
    grid is tiny (points+1 rows), persistable, and comparable across
    days.

    Scale: ranks come from ``global_rank`` (range-repartition +
    per-partition row_number + broadcast offsets — never a
    single-partition sort); the position frame is one scalar aggregate
    crossed with a literal sequence.
    """
    from db_factfinder_spark.operators.ranking import global_rank

    ranked = global_rank(
        ref.select(F.col(value_col).alias("__v"), F.col(id_col)),
        ["__v", id_col],
    )
    n = ref.agg(F.count(F.lit(1)).alias("__n"))
    pos = n.select(
        F.explode(F.sequence(F.lit(0), F.lit(points))).alias("p"),
        F.col("__n"),
    ).select(
        "p",
        (1 + F.expr(f"(__n - 1) * p DIV {points}")).alias("__idx"),
    )
    return pos.join(
        ranked, pos["__idx"] == ranked["rank"]
    ).select("p", F.col("__v").alias("gv"))


def percentile_band_probe(batch, grid, value_col: str):
    """Band every batch row against a reference grid: ``band(x)`` =
    number of grid values ≤ x (0 = below the reference min,
    points+1 = above its max).

    The serving-time half of drift monitoring: a healthy batch bands
    uniformly; mass piling into few bands is distribution shift —
    the rank-space view of PSI without its log floats.

    The grid is collected to a literal array (points+1 values — the
    same bounded-literal pattern as k-means centroids), so banding is
    a pure map-side ``size(filter(...))`` over each row: zero joins,
    zero shuffles on the batch side.
    """
    vals = [r["gv"] for r in grid.orderBy("p").collect()]
    arr = F.array(*[F.lit(v) for v in vals])
    return batch.withColumn(
        "band",
        F.size(F.filter(arr, lambda v: v <= F.col(value_col))).cast(
            "long"
        ),
    )


def rbo_overlap(
    rank_a,
    rank_b,
    id_col: str = "id",
    rank_col: str = "rank",
    depth: int = 10,
):
    """Truncated Rank-Biased Overlap (Webber et al. 2010) between two
    top-``depth`` rankings, with persistence p = 1/2 — chosen because
    dyadic weights make every term an exact integer:

        RBO ≈ Σ_{d=1..depth} overlap(d) / (d · 2^d)

    scaled by ``S = lcm(1..depth) · 2^depth`` each term becomes
    ``overlap(d) · (lcm/d) · 2^(depth−d)`` — int64, order-independent;
    the single division by S happens once at the end.  The metric
    search evaluation uses to answer "how much did the ranking change"
    with top-weighted emphasis, minus the float-accumulation
    nondeterminism of the textbook form.

    Inputs: two frames of ``(id, rank)`` with ranks 1..depth (extra
    rows beyond depth are ignored).  Returns one row per d:
    ``depth_d, overlap, term_scaled`` plus the constant ``scale`` —
    callers sum term_scaled / scale for the RBO value.

    Plan: one equi-join on the id (both sides ≤ depth rows — this is
    a metric over two small TOP lists, not over corpora), then a
    fixed-width conditional-sum sweep.
    """
    import math

    lcm = math.lcm(*range(1, depth + 1))
    a = rank_a.filter(F.col(rank_col) <= depth).select(
        F.col(id_col).alias("__i"), F.col(rank_col).alias("__ra")
    )
    b = rank_b.filter(F.col(rank_col) <= depth).select(
        F.col(id_col).alias("__i"), F.col(rank_col).alias("__rb")
    )
    m = a.join(b, "__i").select(
        F.greatest("__ra", "__rb").alias("__m")
    )
    aggs = [
        F.sum(F.when(F.col("__m") <= d, 1).otherwise(0)).alias(
            f"ov_{d}"
        )
        for d in range(1, depth + 1)
    ]
    wide = m.agg(*aggs)
    rows = [
        wide.select(
            F.lit(d).alias("depth_d"),
            F.coalesce(F.col(f"ov_{d}"), F.lit(0)).alias("overlap"),
            (
                F.coalesce(F.col(f"ov_{d}"), F.lit(0))
                * F.lit((lcm // d) * (1 << (depth - d)))
            ).alias("term_scaled"),
            F.lit(lcm * (1 << depth)).alias("scale"),
        )
        for d in range(1, depth + 1)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def conformal_threshold(
    df,
    group_cols: list[str],
    score_col: str,
    alpha: float = 0.1,
):
    """Split-conformal prediction threshold per group: the k-th
    smallest calibration score with the finite-sample correction
    ``k = min{c : c/(n+1) >= 1 - alpha}`` — guaranteeing
    ``P(new score <= threshold) >= 1 - alpha`` under exchangeability
    (Vovk et al.; the distribution-free coverage recipe).

    The rank bound reuses ``min_count_for_ratio`` — the exact
    smallest-integer-vs-float-threshold probe (a raw
    ``ceil((n+1)(1-alpha))`` float product can be one off at
    adversarial (alpha, n), silently breaking the coverage
    guarantee).  The k-th order statistic is deterministic even under
    score ties (the VALUE at sorted position k does not depend on
    how equal scores permute).

    One count aggregate + one per-group rank window (frame = group
    size — calibration sets are bounded by construction).  Groups
    with ``k > n`` (tiny n vs the coverage demand) return a NULL
    threshold — surfaced, not clamped.

    Returns ``*group_cols, n, k, coverage_target, threshold``.
    """
    from db_factfinder_spark.llmdata.dedup import min_count_for_ratio

    base = df.select(*group_cols, F.col(score_col).alias("__s"))
    n = base.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    n = n.withColumn(
        "k", min_count_for_ratio(F.col("n") + 1, 1.0 - alpha).cast("long")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("__s"))
    ranked = base.withColumn("__r", F.row_number().over(w))
    picked = (
        ranked.join(n, group_cols)
        .filter(F.col("__r") == F.col("k"))
        .select(*group_cols, F.col("__s").alias("threshold"))
    )
    return (
        n.join(picked, group_cols, "left")
        .select(
            *group_cols,
            "n",
            "k",
            (
                F.col("k").cast("double")
                / (F.col("n") + 1).cast("double")
            ).alias("coverage_target"),
            "threshold",
        )
    )


def isotonic_fit(
    bins_df: DataFrame,
    bin_col: str = "bin",
    n_col: str = "n",
    sum_col: str = "sum_y",
) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration fit over score
    bins — pool-adjacent-violators by its CLOSED FORM rather than the
    sequential PAV sweep: ``fitted(k) = max_{i<=k} min_{j>=k}
    mean(y[i..j])`` (Barlow et al. 1972, the minimax characterisation),
    which is pure set algebra and needs no ordered iteration.

    Input is the already-binned reliability frame (one row per bin:
    exact ``n`` and ``sum_y`` counts — the calibration_bins shape), so
    the frame is BOUNDED BY DESIGN: B = O(bins), and the closed form
    materialises O(B³) (bin, i, j) rows.  At the customary 10–100
    calibration bins that is ≤ 1e6 tiny rows; this operator is for
    fitting the calibration map, never for per-example data (the
    per-example pass is the groupBy that produced ``bins_df``).

    Exactness: each candidate mean is ONE IEEE division of two exact
    integer sums (identical operands → identical double on any
    engine); min/max over identical doubles are exact, and equal
    rationals round to the same double (IEEE division is correctly
    rounded), so pooling ties cross-engine.
    """
    b = bins_df.select(
        F.col(bin_col).alias("bin"),
        F.col(n_col).cast("long").alias("n"),
        F.col(sum_col).cast("long").alias("sum_y"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # single-partition window over the BINS frame only (bounded by
    # design, see docstring) — never over the raw data
    cum = b.select(
        "bin", "n", "sum_y",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("sum_y").over(w).alias("cum_y"),
    ).select(
        "bin", "n", "sum_y", "cum_n", "cum_y",
        (F.col("cum_n") - F.col("n")).alias("prev_n"),
        (F.col("cum_y") - F.col("sum_y")).alias("prev_y"),
    )
    i = cum.select(
        F.col("bin").alias("i"),
        F.col("prev_n").alias("i_prev_n"),
        F.col("prev_y").alias("i_prev_y"),
    )
    j = cum.select(
        F.col("bin").alias("j"),
        F.col("cum_n").alias("j_cum_n"),
        F.col("cum_y").alias("j_cum_y"),
    )
    spans = i.join(j, F.col("i") <= F.col("j")).select(
        "i", "j",
        (
            (F.col("j_cum_y") - F.col("i_prev_y")).cast("double")
            / (F.col("j_cum_n") - F.col("i_prev_n")).cast("double")
        ).alias("avg"),
    )
    k = b.select(F.col("bin").alias("k"))
    inner = (
        spans.join(
            k, (F.col("i") <= F.col("k")) & (F.col("k") <= F.col("j"))
        )
        .groupBy("k", "i")
        .agg(F.min("avg").alias("m"))
        .groupBy("k")
        .agg(F.max("m").alias("fitted"))
    )
    return b.join(inner, b["bin"] == inner["k"]).select(
        "bin", "n", "sum_y",
        (
            F.col("sum_y").cast("double") / F.col("n").cast("double")
        ).alias("rate"),
        "fitted",
    )


def sprt_decision(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    success_col: str,
    p0: tuple[int, int] = (3, 10),
    p1: tuple[int, int] = (4, 10),
    alpha: tuple[int, int] = (1, 20),
    beta: tuple[int, int] = (1, 10),
) -> DataFrame:
    """Wald's sequential probability-ratio test over an ordered event
    stream, one decision row per group — the always-on A/B monitor
    that stops an experiment the moment the evidence crosses a bound
    instead of waiting for a fixed horizon.

    Parameters are exact integer rationals (num, den).  The two
    per-event log-likelihood increments and the two Wald bounds
    ``A = ln((1-β)/α)``, ``B = ln(β/(1-α))`` reduce to differences of
    ``ln`` of POSITIVE INTEGERS, computed by ``portable_ln`` (libm-
    free, cross-engine bit-identical) and quantized to integer
    nano-nats, so the cumulative LLR is an exact integer cumsum: no
    float accumulation anywhere, byte-identical on any engine and any
    partitioning.

    Plan: one window cumsum per group (single shuffle on the group
    key) + one groupBy on the same key (AQE reuses the exchange).
    Decision is taken at the FIRST bound crossing (SPRT stops there;
    later wandering is reported only through ``final_llr_nano``).
    """
    from db_factfinder_spark.functions.portable_math import portable_ln

    p0n, p0d = p0
    p1n, p1d = p1
    an, ad = alpha
    bn, bd = beta
    if not (0 < p0n < p0d and 0 < p1n < p1d):
        raise ValueError("p0 and p1 must be strict rationals in (0, 1)")
    if not (0 < an < ad and 0 < bn < bd):
        raise ValueError(
            "alpha and beta must be strict rationals in (0, 1) — "
            "degenerate error rates would feed portable_ln a 0 argument"
        )

    def _ln_ratio_nano(num: int, den: int) -> Column:
        return F.floor(
            (portable_ln(F.lit(num)) - portable_ln(F.lit(den)))
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long")

    c1 = _ln_ratio_nano(p1n * p0d, p0n * p1d)          # ln(p1/p0)
    c0 = _ln_ratio_nano((p1d - p1n) * p0d, (p0d - p0n) * p1d)
    a_bound = _ln_ratio_nano((bd - bn) * ad, bd * an)  # ln((1-β)/α)
    b_bound = _ln_ratio_nano(bn * ad, bd * (ad - an))  # ln(β/(1-α))

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inc = F.when(F.col(success_col).cast("boolean"), c1).otherwise(c0)
    scored = df.select(
        *group_cols, F.col(order_col).alias("__ord"), inc.alias("__inc")
    ).withColumn("__llr", F.sum("__inc").over(w))
    crossing = F.when(F.col("__llr") >= a_bound, F.lit("h1")).when(
        F.col("__llr") <= b_bound, F.lit("h0")
    )
    marked = scored.withColumn("__cross", crossing)
    return (
        marked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max_by("__llr", "__ord").alias("final_llr_nano"),
            F.min(
                F.when(F.col("__cross").isNotNull(), F.col("__ord"))
            ).alias("decided_at"),
            F.min_by(
                F.struct("__cross", "__llr"),
                F.when(F.col("__cross").isNotNull(), F.col("__ord")),
            ).alias("__at"),
        )
        .select(
            *group_cols,
            "n_events",
            "final_llr_nano",
            F.coalesce(F.col("__at.__cross"), F.lit("continue")).alias(
                "decision"
            ),
            "decided_at",
            F.when(
                F.col("decided_at").isNotNull(), F.col("__at.__llr")
            ).alias("llr_at_decision"),
        )
    )
