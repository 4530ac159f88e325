"""Grouped closed-form linear regression (regr_slope/regr_intercept
semantics) with engine-portable exactness.

Native ``regr_slope`` accumulates floating-point co-moments whose
order differs per engine and per partitioning — fine for analytics,
useless for cross-engine reconciliation.  Here the five sufficient
statistics (n, Σx, Σy, Σxy, Σx²) are EXACT integers (inputs are
integer-coded: an epoch-second offset and a fixed-decimal unit value),
summed as decimals so no magnitude or ordering can perturb them, and
the closed form

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²sum)
    intercept = (Σy − slope·Σx) / n

is evaluated in a FIXED operation order on doubles, each operand a
correctly-rounded cast of an exact integer — so any engine produces
the bit-identical result.

Scale shape: one map-side-combined groupBy — the same cost as any
keyed aggregate; no second pass, no co-moment windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def grouped_linreg(
    df: DataFrame,
    keys: Sequence[str],
    x: Column,
    y_units: Column,
) -> DataFrame:
    """Per-key OLS slope/intercept of integer-coded (x, y) pairs.

    ``x`` and ``y_units`` must be exact integer expressions (callers
    code their measures: epoch-offset seconds, value·10^d units).
    Returns ``keys..., n, slope_u, intercept_u`` where the ``_u``
    outputs are in y-units per x-unit (undo the caller's coding by
    dividing once at the end — one more identical IEEE op).
    Degenerate groups (all x equal → zero variance) yield NULL slope.
    """
    # operands go to decimal BEFORE multiplying/summing: a long×long
    # product (or a long sum) would silently wrap for large codings,
    # exactly the magnitude failure this operator exists to avoid
    xd = x.cast("long").cast(_DEC)
    yd = y_units.cast("long").cast(_DEC)
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast(_DEC).alias("__n"),
        F.sum(xd).alias("__sx"),
        F.sum(yd).alias("__sy"),
        F.sum(xd * yd).alias("__sxy"),
        F.sum(xd * xd).alias("__sxx"),
    )
    num = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    den = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    slope = F.when(den != 0, num / den)
    intercept = (
        F.col("__sy").cast("double") - slope * F.col("__sx").cast("double")
    ) / F.col("__n").cast("double")
    return agg.select(
        *keys,
        F.col("__n").cast("long").alias("n"),
        slope.alias("slope_u"),
        intercept.alias("intercept_u"),
    )


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str, checkpoint_mode: str = "local"
) -> DataFrame:
    """Pearson χ² test of independence between two categorical
    columns — the data-quality / drift primitive ("did the label
    distribution shift across sources?").

    Exactness contract: observed counts and marginals are exact
    integers; each cell's expected value E = (row·col)/n is one
    correctly-rounded division; the cell statistic (O−E)²/E is a
    fixed four-op IEEE chain; and the CROSS-CELL SUM — the one place
    float order would differ between engines — is made order-free by
    quantizing each cell to 1e-9 fixed point (exact bigint sum, one
    final division).  dof = (r−1)(c−1) from exact distinct counts.

    One count shuffle on (a, b); marginals fold from the cell frame
    (never rescan); everything else broadcasts.

    Output: per-cell rows ``a, b, n_obs, n_exp, cell_chi2`` plus the
    table-level ``chi2, dof, n`` repeated on each row (broadcast
    1-row join) so one frame carries the whole test.
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    # observed and cells fan out to 4+ consumers each (grid distincts,
    # marginals, totals, the cell join); without lineage truncation
    # every consumer re-evaluates the whole upstream subtree — for a
    # token-explode input that multiplied to ~100 scans of the source.
    # Both frames are grid-bounded (≤ r×c rows), so materializing is
    # free at any input scale.
    observed = materialize(
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count(F.lit(1)).alias("n_obs")),
        checkpoint_mode,
    )
    # COMPLETE the r×c grid: zero cells carry (0−E)²/E = E — dropping
    # them (the natural groupBy output) silently understates χ², worst
    # exactly when dependence is strongest (a diagonal table keeps
    # only r cells of r²)
    grid = observed.select("a").distinct().crossJoin(
        observed.select("b").distinct()
    )
    cells = materialize(
        grid.join(observed, ["a", "b"], "left").select(
            "a", "b", F.coalesce("n_obs", F.lit(0)).alias("n_obs")
        ),
        checkpoint_mode,
    )
    row_t = cells.groupBy("a").agg(F.sum("n_obs").alias("__ra"))
    col_t = cells.groupBy("b").agg(F.sum("n_obs").alias("__cb"))
    tot = cells.agg(
        F.sum("n_obs").alias("n"),
        F.countDistinct("a").alias("__nr"),
        F.countDistinct("b").alias("__nc"),
    )
    j = (
        cells.join(F.broadcast(row_t), "a")
        .join(F.broadcast(col_t), "b")
        .crossJoin(F.broadcast(tot))
    )
    e = (F.col("__ra") * F.col("__cb")).cast("double") / F.col("n").cast(
        "double"
    )
    o = F.col("n_obs").cast("double")
    cell = (o - e) * (o - e) / e
    withq = j.withColumn("n_exp", e).withColumn(
        "cell_chi2", cell
    ).withColumn(
        "__q", F.floor(cell * F.lit(1000000000.0) + F.lit(0.5)).cast("long")
    )
    total = withq.agg(
        (F.sum("__q").cast("double") / F.lit(1000000000.0)).alias("chi2"),
        F.max((F.col("__nr") - 1) * (F.col("__nc") - 1)).alias("dof"),
        F.max("n").alias("n"),
    )
    return (
        withq.select("a", "b", "n_obs", "n_exp", "cell_chi2")
        .crossJoin(F.broadcast(total))
    )


def ab_test_summary(
    df: DataFrame,
    unit_col: str,
    value_c_col: str,
    salt: str = "ab",
) -> DataFrame:
    """Deterministic A/B experiment readout: units assign to arms by
    md5 of (salt | unit) — the stable bucketing every experimentation
    platform uses (re-runs and late-arriving data land in the same
    arm; a new salt is a new experiment) — and the readout is the
    Welch t statistic over an exact-cents metric.

    Exactness: per-arm n, Σv, Σv² fold as exact integers; means,
    sample variances and the t statistic are a FIXED chain of
    correctly-rounded IEEE ops from those integers, so the decision
    number is engine-identical (the oracle recomputes it op for op).
    Degrees of freedom (Welch–Satterthwaite) are left to the caller —
    they add nothing to the cross-engine contract and everything to
    its fragility.

    One aggregation shuffle on the arm (2 groups); the pivot to one
    wide row is a conditional-agg fold, not a join.

    Output: one row — ``n_a, n_b, mean_a, mean_b, var_a, var_b,
    diff, t``.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}|"), F.col(unit_col).cast("string"))),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")
    armed = df.filter(F.col(value_c_col).isNotNull()).select(
        (h % 2).alias("arm"), F.col(value_c_col).alias("v")
    )
    per_arm = armed.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    wide = per_arm.agg(
        *[
            F.max(F.when(F.col("arm") == a, F.col(c))).alias(f"{c}_{t}")
            for a, t in [(0, "a"), (1, "b")]
            for c in ("n", "s1", "s2")
        ]
    )

    def stats(t: str):
        n = F.col(f"n_{t}").cast("double")
        s1 = F.col(f"s1_{t}").cast("double")
        s2 = F.col(f"s2_{t}").cast("double")
        mean = s1 / n
        var = (s2 - (s1 * s1) / n) / (n - F.lit(1.0))
        return mean, var

    mean_a, var_a = stats("a")
    mean_b, var_b = stats("b")
    diff = mean_b - mean_a
    t_stat = diff / F.sqrt(
        var_a / F.col("n_a").cast("double")
        + var_b / F.col("n_b").cast("double")
    )
    return wide.select(
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        var_a.alias("var_a"),
        var_b.alias("var_b"),
        diff.alias("diff"),
        t_stat.alias("t"),
    )


def grouped_correlation(
    df: DataFrame,
    keys: Sequence[str],
    x: Column,
    y_units: Column,
) -> DataFrame:
    """Per-key Pearson correlation of integer-coded (x, y) pairs —
    grouped_linreg's companion: the same five exact sufficient
    statistics (decimal-summed, no wrap, no float accumulation) plus
    Σy², with

        r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))

    evaluated in a FIXED order: both radicands are exact integers
    cast once to double, each √ is one correctly-rounded IEEE op, so
    any engine produces the bit-identical r.  (Native ``corr()``
    accumulates float co-moments in partition order — fine for
    analytics, useless for cross-engine reconciliation.)  Degenerate
    groups (either variance zero) yield NULL.

    One map-side-combined groupBy — the cost of any keyed aggregate.
    Output: ``keys..., n, r``.
    """
    xd = x.cast("long").cast(_DEC)
    yd = y_units.cast("long").cast(_DEC)
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast(_DEC).alias("__n"),
        F.sum(xd).alias("__sx"),
        F.sum(yd).alias("__sy"),
        F.sum(xd * yd).alias("__sxy"),
        F.sum(xd * xd).alias("__sxx"),
        F.sum(yd * yd).alias("__syy"),
    )
    num = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    vx = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    vy = (F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(
        "double"
    )
    r = F.when((vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy)))
    return agg.select(
        *keys,
        F.col("__n").cast("long").alias("n"),
        r.alias("r"),
    )


def grouped_spearman(
    df: DataFrame,
    keys: Sequence[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-key Spearman rank correlation with exact tie handling —
    the robust (monotone-invariant) sibling of ``grouped_correlation``.

    Tied-average ranks are kept in exact integers by the ×2 trick
    shared with ``grouped_auc``: every row of a value-run [lo..hi]
    gets rank₂ = 2·cum_before + cnt + 1 (twice the tied-average rank,
    always integral), computed per variable from the DISTINCT-value
    histogram — the cumulative window orders only (group, value)
    rows, never the raw table.  Pearson on the two rank₂ columns is
    Spearman exactly (r is scale-invariant), evaluated through
    ``grouped_correlation``'s fixed-order exact-statistic path, so ρ
    is bit-identical in any engine, ties included.

    Three keyed shuffles (two histogram+join passes, one aggregate).
    Output: ``keys…, n, r`` (r = ρ; NULL for degenerate groups).
    """
    work = df.select(
        *keys, x.alias("__x"), y.alias("__y")
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())

    def with_rank2(d: DataFrame, col: str, out: str) -> DataFrame:
        cnt = d.groupBy(*keys, col).agg(F.count(F.lit(1)).alias("__c"))
        w = Window.partitionBy(*keys).orderBy(col)
        ranked = (
            cnt.withColumn("__cum", F.sum("__c").over(w))
            .withColumn(
                out,
                (
                    F.lit(2) * (F.col("__cum") - F.col("__c"))
                    + F.col("__c")
                    + F.lit(1)
                ).cast("long"),
            )
            .select(*keys, col, out)
        )
        return d.join(ranked, [*keys, col])

    ranked = with_rank2(
        with_rank2(work, "__x", "__rx"), "__y", "__ry"
    )
    return grouped_correlation(
        ranked, list(keys), F.col("__rx"), F.col("__ry")
    )


def decision_stump(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Best binary split by Gini — the 1-D decision-stump inducer.

    Every observed feature value is a candidate threshold (left =
    ``feature ≤ v``); the Gini-optimal split maximizes
    ``A/n_L + B/n_R`` where A/B are the sums of squared class counts
    on each side — derived from ONE cumulative window over the sorted
    distinct-value frame, so evaluating all n candidate splits costs
    one sort + one pass, not n scans (the CART batch trick).

    Arithmetic: every count is exact int64; the score's single IEEE
    division ``(A·n_R + B·n_L) / (n_L·n_R)`` happens once per
    candidate on exact integers (numerator ≤ n³ — int64-safe to
    n ≈ 2M rows per stump; larger inputs should pre-bucket the
    feature, which is also statistically wiser).  Ranking ties break
    on ascending threshold.

    ``label_col`` must be boolean.  Returns the ``top_k`` splits:
    ``threshold, n_left, n_right, pos_left, pos_right, score, rank``
    (splits with an empty right side are excluded — they are the
    no-split).
    """
    agg = df.select(
        F.col(feature_col).alias("v"),
        F.col(label_col).cast("int").alias("y"),
    ).groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("y").alias("pos"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = agg.agg(
        F.sum("cnt").alias("n"), F.sum("pos").alias("p")
    )
    cum = agg.select(
        "v",
        F.sum("cnt").over(w).alias("nl"),
        F.sum("pos").over(w).alias("pl"),
    ).crossJoin(F.broadcast(tot))
    cand = cum.filter(F.col("nl") < F.col("n")).select(
        F.col("v").alias("threshold"),
        F.col("nl").alias("n_left"),
        (F.col("n") - F.col("nl")).alias("n_right"),
        F.col("pl").alias("pos_left"),
        (F.col("p") - F.col("pl")).alias("pos_right"),
        F.col("n"),
        F.col("p"),
    )
    a = (
        F.col("pos_left") * F.col("pos_left")
        + (F.col("n_left") - F.col("pos_left"))
        * (F.col("n_left") - F.col("pos_left"))
    )
    b = (
        F.col("pos_right") * F.col("pos_right")
        + (F.col("n_right") - F.col("pos_right"))
        * (F.col("n_right") - F.col("pos_right"))
    )
    scored = cand.withColumn(
        "score",
        (a * F.col("n_right") + b * F.col("n_left"))
        / (F.col("n_left") * F.col("n_right")),
    )
    wr = Window.orderBy(F.desc("score"), F.asc("threshold"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_k)
        .select(
            "threshold", "n_left", "n_right", "pos_left", "pos_right",
            "score", "rank",
        )
    )


def ks_statistic(
    df: DataFrame,
    group_cols: list[str],
    sample_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per group — the
    distribution-drift test: D = max over values of
    |F̂₁(v) − F̂₂(v)| between sample 0 and sample 1 of ``sample_col``.

    Exact-rational form: with cumulative counts c₁(v), c₂(v) and
    totals N₁, N₂,

      D = max |c₁·N₂ − c₂·N₁| / (N₁·N₂)

    — the max runs over INTEGERS (no float CDF ever compared), and the
    one terminal division is mirrored by the oracle.  The cross
    product goes through decimal before multiplying (two 100 TB-scale
    counts would wrap int64).

    Plan: one (group, value, sample) count aggregate, cumulative
    window PARTITIONED by group ordered by value (frame = the group's
    distinct-value cardinality — the operator's documented bound; a
    continuous 100 TB column should be pre-bucketed, which changes D
    by at most the bucket mass), then one max per group.

    Returns ``*group_cols, n1, n2, d_num, d_den, ks`` (``d_num/d_den``
    exact; ``ks`` the single division).
    """
    base = df.select(
        *group_cols,
        F.col(value_col).alias("v"),
        F.when(F.col(sample_col).cast("int") == 1, 1).otherwise(0).alias("s"),
    )
    per_v = base.groupBy(*group_cols, "v").agg(
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("a1"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("a2"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_v.withColumn("c1", F.sum("a1").over(w)).withColumn(
        "c2", F.sum("a2").over(w)
    )
    tot = df.groupBy(*group_cols).agg(
        F.sum(
            F.when(F.col(sample_col).cast("int") == 1, 0).otherwise(1)
        ).alias("n1"),
        F.sum(
            F.when(F.col(sample_col).cast("int") == 1, 1).otherwise(0)
        ).alias("n2"),
    )
    dec = "decimal(38,0)"
    j = cum.join(tot, group_cols)
    diff = F.abs(
        F.col("c1").cast(dec) * F.col("n2").cast(dec)
        - F.col("c2").cast(dec) * F.col("n1").cast(dec)
    )
    per_group = j.groupBy(*group_cols, "n1", "n2").agg(
        F.max(diff).alias("d_num")
    )
    return per_group.select(
        *group_cols,
        "n1",
        "n2",
        F.col("d_num").cast("double").alias("d_num"),
        (F.col("n1").cast(dec) * F.col("n2").cast(dec))
        .cast("double")
        .alias("d_den"),
        (
            F.col("d_num").cast("double")
            / (F.col("n1").cast(dec) * F.col("n2").cast(dec)).cast("double")
        ).alias("ks"),
    )


def loo_influence(
    df: DataFrame,
    keys: Sequence[str],
    x: Column,
    y_units: Column,
) -> DataFrame:
    """Leave-one-group-out OLS influence: for every group, the global
    slope refit WITHOUT that group, by sufficient-statistic
    subtraction — the closed-form data-valuation readout ("which
    source is dragging the fit") that needs no second pass over the
    data: the five global sums minus the group's five sums ARE the
    refit's sufficient statistics.

    Exactness follows grouped_linreg: integer-coded inputs, decimal
    sums (order-free), and the slope closed form evaluated in a fixed
    IEEE order.  Callers must code x/y so that ``n·Σxy`` stays below
    2^53 — beyond that the wide-integer→double cast is the one step
    where engines legally disagree by an ulp (the calibration_bins
    finding); sample or rescale first.

    Plan: ONE map-side-combined groupBy builds the per-group stats;
    the global stats are their order-free decimal re-sum, broadcast
    back as a single row.  No second scan of the raw table.
    """
    xd = x.cast("long").cast(_DEC)
    yd = y_units.cast("long").cast(_DEC)
    per = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast(_DEC).alias("__n"),
        F.sum(xd).alias("__sx"),
        F.sum(yd).alias("__sy"),
        F.sum(xd * yd).alias("__sxy"),
        F.sum(xd * xd).alias("__sxx"),
    )
    tot = per.agg(
        F.sum("__n").alias("__tn"),
        F.sum("__sx").alias("__tsx"),
        F.sum("__sy").alias("__tsy"),
        F.sum("__sxy").alias("__tsxy"),
        F.sum("__sxx").alias("__tsxx"),
    )

    def _slope(n, sx, sy, sxy, sxx):
        num = (n * sxy - sx * sy).cast("double")
        den = (n * sxx - sx * sx).cast("double")
        return F.when(den != 0, num / den)

    j = per.crossJoin(F.broadcast(tot))
    slope_full = _slope(
        F.col("__tn"), F.col("__tsx"), F.col("__tsy"),
        F.col("__tsxy"), F.col("__tsxx"),
    )
    slope_wo = _slope(
        F.col("__tn") - F.col("__n"),
        F.col("__tsx") - F.col("__sx"),
        F.col("__tsy") - F.col("__sy"),
        F.col("__tsxy") - F.col("__sxy"),
        F.col("__tsxx") - F.col("__sxx"),
    )
    return j.select(
        *keys,
        F.col("__n").cast("long").alias("n"),
        slope_full.alias("slope_full"),
        slope_wo.alias("slope_without"),
        (slope_wo - slope_full).alias("influence"),
    )
