"""Grouped interpolated median + MOE as pure Spark SQL expressions.

The reference computes medians per geography row with an iterative
Python class (median.py:7-197) applied via ``df.apply(axis=1)``
(calculate.py:159-164).  Here the whole algorithm — cumulative
distribution, bin location, linear interpolation, top/bottom-coding,
and the standard-error bound interpolation for the MOE — is a set of
native column expressions over an ``array<double>`` of bin counts.
Everything stays JVM-side in whole-stage codegen; no Python, no UDF,
no shuffle beyond the pivot that feeds it.

Semantics replicated exactly from the reference, including its quirks:

* the median bin is the *first* bin whose cumulative count reaches
  B/2 (median.py:45-52's ``while C < N/2`` loop);
* bottom-coding returns the first bin's upper bound, top-coding the
  last bin's lower bound (median.py:53-62);
* bound interpolation hard-codes ``ordered[1]``'s lower edge when the
  bound bin is the first non-zero bin, with ``mdrms``-style variables
  using 0.5 as the floor (median.py:124-128);
* ``upper_bound``'s first-non-zero branch keeps the reference's
  ``a == b & a == c`` operator-precedence quirk (median.py:150), i.e.
  ``(upper == (lower & upper)) and ((lower & upper) == fnz)`` with ``&``
  the *bitwise* and of the bin indices;
* ``upper_bound`` with the bound bin at index 0 reads the cumulative
  distribution at python index -1 (wraps to the last element) — the
  base_case C1 lookup (median.py:103) — replicated via modular index;
* MOE is NULL when the median reaches the top bin, B == 0, se_50 ≥ 50,
  or the lower bound bin is the last bin (median.py:165-172).

Known deliberate deviation: where the reference's float division by
zero produces ±inf (numpy), these expressions produce NULL — reachable
only in degenerate states the pipeline never produces (documented in
SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from db_factfinder_spark.catalog import MedianSpec
from db_factfinder_spark.functions.expr import let

ACS_Z = 1.645  # 90% confidence z-score used throughout ACS


def _first_index_where(arr: Column, n: int, pred) -> Column:
    """0-based index of the first array element satisfying ``pred``,
    NULL if none.  ``pred`` receives (element)."""
    idx = F.filter(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: pred(F.element_at(arr, i + F.lit(1))),
    )
    return F.get(idx, F.lit(0))


def median_struct(spec: MedianSpec, cnt_cols: list[Column]) -> Column:
    """``struct<e: double, m: double>`` of (median, median_moe) from
    per-bin count columns given in catalog bin order.  NULL counts are
    treated as 0 (the pivoted frame yields NULL for geographies missing
    a bin variable; the reference's groupby-sum produces 0.0 there).

    Every shared intermediate (count array, cumulative distribution,
    bin indexes) is let-bound: naive Column reuse textually duplicates
    subtrees, which here compounded into multi-MiB expression trees —
    each cumulative-sum leaf re-evaluated dozens of times per row."""
    bins = spec.bins
    n = len(bins)
    lo = [b[1] for b in bins]
    hi = [b[2] for b in bins]
    lo_arr = F.array(*[F.lit(float(x)) for x in lo])

    def with_cum(cnts: Column, cumcnt: Column) -> Column:
        B = F.element_at(cumcnt, n)
        halfB = B / 2  # safe: only consumed under B != 0 guards below

        # --- median (median.py:43-78) ----------------------------------
        med_i = _first_index_where(cumcnt, n, lambda c: c >= halfB)
        # --- MOE setup (median.py:7-41) --------------------------------
        se_50 = F.when(
            B != 0, F.lit(spec.design_factor) * F.sqrt(93.0 / (7.0 * B) * 2500.0)
        )
        cumpct = F.transform(cumcnt, lambda c: F.try_divide(c, B) * 100)

        env0 = F.struct(
            med_i.alias("med_i"), se_50.alias("se_50"), cumpct.alias("cumpct")
        )
        return let(env0, lambda env: with_env(cnts, cumcnt, B, halfB, env))

    def with_env(cnts, cumcnt, B, halfB, env) -> Column:
        med_i = env["med_i"]
        se_50 = env["se_50"]
        cumpct = env["cumpct"]
        p_lower = F.lit(50.0) - se_50
        p_upper = F.lit(50.0) + se_50

        c_med = F.get(cumcnt, med_i)
        cnt_med = F.get(cnts, med_i)
        lo_med = F.get(lo_arr, med_i)
        w_med = F.get(
            F.array(*[F.lit(float(h - l)) for l, h in zip(lo, hi)]), med_i
        )
        interpolated = lo_med + F.try_divide(
            (halfB - (c_med - cnt_med)) * w_med, cnt_med
        )
        median = (
            F.when(B == 0, F.lit(None).cast("double"))
            .when((med_i == 0) & F.lit(spec.bottom_coding), F.lit(float(hi[0])))
            .when(c_med == 0, F.lit(None).cast("double"))
            .when(
                (med_i == n - 1) & F.lit(spec.top_coding), F.lit(float(lo[n - 1]))
            )
            .otherwise(interpolated)
        )

        lower_bin = _first_index_where(cumpct, n, lambda c: c > p_lower)
        upper_bin = _first_index_where(cumpct, n, lambda c: c > p_upper)
        fnz = _first_index_where(cumpct, n, lambda c: c != 0.0)
        idx0 = F.struct(
            lower_bin.alias("lb"), upper_bin.alias("ub"), fnz.alias("fnz")
        )
        return let(
            idx0,
            lambda idx: finish(
                B, se_50, p_lower, p_upper, cumpct, median, idx
            ),
        )

    def get_bound(p: Column, a1: Column, a2: Column, c1: Column, c2: Column) -> Column:
        # median.py:93-97 — NULL when the degenerate guard trips.
        return F.when(
            ((c2 - c1) + a1) != 0,
            F.try_divide((p - c1) * (a2 - a1), (c2 - c1)) + a1,
        )

    def finish(B, se_50, p_lower, p_upper, cumpct, median, idx) -> Column:
        lower_bin, upper_bin, fnz = idx["lb"], idx["ub"], idx["fnz"]

        # lower bound (median.py:112-139)
        lb_is_fnz = lower_bin == fnz
        a1_l = F.when(
            lb_is_fnz, F.lit(0.5 if spec.pff_variable == "mdrms" else 0.0)
        ).otherwise(F.get(lo_arr, lower_bin))
        a2_l = F.when(
            lb_is_fnz, F.lit(float(lo[1])) if n > 1 else F.lit(None)
        ).otherwise(F.when(lower_bin + 1 <= n - 1, F.get(lo_arr, lower_bin + 1)))
        c1_l = F.when(lower_bin == 0, F.lit(0.0)).otherwise(
            F.get(cumpct, lower_bin - 1)
        )
        c2_l = F.get(cumpct, lower_bin)
        lower_bound = get_bound(p_lower, a1_l, a2_l, c1_l, c2_l)

        # upper bound (median.py:141-162), overrides applied in reference
        # order: top-bin first, then the first-non-zero precedence quirk
        # (the quirk wins when both fire, as in the reference).
        band = lower_bin.bitwiseAND(upper_bin)
        quirk = (upper_bin == band) & (band == fnz)
        top = upper_bin == n - 1
        a1_u = (
            F.when(quirk, F.lit(0.0))
            .when(top, F.lit(float(lo[n - 1])))
            .otherwise(F.get(lo_arr, upper_bin))
        )
        a2_u = (
            F.when(quirk, F.lit(float(lo[1])) if n > 1 else F.lit(None))
            .when(top, F.lit(float(lo[n - 1])))
            .otherwise(F.when(upper_bin + 1 <= n - 1, F.get(lo_arr, upper_bin + 1)))
        )
        # python row[-1] wraparound when upper_bin == 0 (median.py:103)
        c1_u = F.get(cumpct, (upper_bin - 1 + n) % n)
        c2_u = F.get(cumpct, upper_bin)
        upper_bound = get_bound(p_upper, a1_u, a2_u, c1_u, c2_u)

        median_moe = (
            F.when(median >= F.lit(float(lo[n - 1])), F.lit(None).cast("double"))
            .when(B == 0, F.lit(None).cast("double"))
            .when(se_50 >= 50, F.lit(None).cast("double"))
            .when(lower_bin >= n - 1, F.lit(None).cast("double"))
            .otherwise((upper_bound - lower_bound) * ACS_Z / 2)
        )
        return F.struct(median.alias("e"), median_moe.alias("m"))

    cnts0 = F.array(*[F.coalesce(c.cast("double"), F.lit(0.0)) for c in cnt_cols])

    def with_cnts(cnts: Column) -> Column:
        # Running (sequential) cumulative sum — same accumulation order
        # as the reference's np.cumsum, so identical floating-point
        # results.
        cumcnt0 = F.aggregate(
            cnts,
            F.struct(
                F.lit([]).cast("array<double>").alias("arr"), F.lit(0.0).alias("s")
            ),
            lambda acc, x: F.struct(
                F.concat(acc["arr"], F.array(acc["s"] + x)).alias("arr"),
                (acc["s"] + x).alias("s"),
            ),
            lambda acc: acc["arr"],
        )
        return let(cumcnt0, lambda cumcnt: with_cum(cnts, cumcnt))

    return let(cnts0, with_cnts)


def median_e_m_columns(spec: MedianSpec, cnt_cols: list[Column]) -> tuple[Column, Column]:
    """Compatibility wrapper over :func:`median_struct` returning the
    (median, median_moe) pair.  Note each element carries its own copy
    of the (now let-compacted) expression tree; where both are needed,
    prefer projecting ``median_struct`` once and selecting fields."""
    s = median_struct(spec, cnt_cols)
    return s["e"].alias("e"), s["m"].alias("m")


def calculate_median(
    pivoted: DataFrame,
    spec: MedianSpec,
    geotype: str,
    struct: Column | None = None,
) -> DataFrame:
    """Pivoted frame (census_geoid + one count column per bin variable,
    named after the bin variable) → long ``(census_geoid, pff_variable,
    geotype, e, m)`` with the interpolated median and its MOE.

    Two-step select: the struct is projected once, then fields are
    pulled — CollapseProject keeps the non-cheap struct expression in
    its own projection, so the median math runs once per row, not once
    per output column.

    ``struct`` optionally supplies a PREBUILT ``median_struct`` column
    (it is an unresolved expression over the bin-variable names, so one
    build serves every frame with those columns): constructing the
    ~26-bin expression costs ~0.5 s of py4j round-trips, which the
    full-catalog batch would otherwise pay once per (median, geotype)."""
    s = struct if struct is not None else median_struct(
        spec, [F.col(v) for v in spec.input_variables]
    )
    return pivoted.select("census_geoid", s.alias("__med")).select(
        "census_geoid",
        F.lit(spec.pff_variable).alias("pff_variable"),
        F.lit(geotype).alias("geotype"),
        F.col("__med.e").alias("e"),
        F.col("__med.m").alias("m"),
    )


def grouped_weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value v
    whose cumulative weight reaches half the group total
    (2·cum(v) ≥ W).  The discrete rule is deliberate — it needs no
    interpolation, so with integer weights every comparison is exact
    integer arithmetic and any engine lands on the identical row.
    (The census median above interpolates within coded bins; this is
    the generic order-statistic for weighted rows.)

    One window (value-ordered cumulative weight within the group) +
    one aggregation taking the first qualifying value via min-struct.
    Both shuffles key on the group; a skewed group concentrates one
    window partition like any keyed sort — AQE applies.  Zero/negative
    weights are excluded (they contribute no mass and would break the
    monotone-cumulative argument); ties on value are merged by the
    cumulative sum before the rule applies, so duplicates are safe.

    Output: ``*group_cols, w_total, w_median``.
    """
    from pyspark.sql import Window

    rows = df.filter(F.col(weight_col) > 0).select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.col(weight_col).alias("__w"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rows.withColumn("__cum", F.sum("__w").over(w))
    tot = cum.groupBy(*group_cols).agg(
        F.max("__cum").alias("w_total")
    )
    qualified = cum.join(tot, group_cols).filter(
        F.col("__cum") * 2 >= F.col("w_total")
    )
    return (
        qualified.groupBy(*group_cols)
        .agg(
            F.max("w_total").alias("w_total"),
            F.min("__v").alias("w_median"),
        )
    )


def grouped_weighted_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    probs: list[float],
) -> DataFrame:
    """Exact lower weighted quantiles per group for several
    probabilities at once: q_p = smallest v with cum(v) ≥ p·W,
    evaluated as ``cum·D ≥ round(p·D)·W`` over a common denominator
    D = 10⁶ — ALL-INTEGER comparisons (probabilities become exact
    integer numerators), so every engine lands on the identical rows.
    Generalizes grouped_weighted_median (p = 0.5 reproduces its
    2·cum ≥ W rule exactly when round(0.5·D)·2 = D).

    ONE value-ordered cumulative window + one qualifying-min
    aggregation per probability over the same cum frame — the window
    runs once however many quantiles are asked.

    Output: ``*group_cols, w_total, q<pct> per prob`` (q10, q50, …).
    """
    from pyspark.sql import Window

    D = 1_000_000
    rows = df.filter(F.col(weight_col) > 0).select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.col(weight_col).alias("__w"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rows.withColumn("__cum", F.sum("__w").over(w))
    tot = cum.groupBy(*group_cols).agg(F.max("__cum").alias("w_total"))
    j = cum.join(tot, group_cols)
    aggs = [F.max("w_total").alias("w_total")]
    for p in probs:
        num = round(p * D)
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum") * D >= F.lit(num) * F.col("w_total"),
                    F.col("__v"),
                )
            ).alias(f"q{int(round(p * 100))}")
        )
    return j.groupBy(*group_cols).agg(*aggs)


def grouped_mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 3,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Robust per-group outlier screen via the Median Absolute
    Deviation — the audit rule that survives the very outliers it
    hunts (mean/σ screens move with contamination; the median pair
    does not).  A row is flagged when |v − median| > k·MAD.

    Composition, not reimplementation: BOTH medians come from
    ``grouped_weighted_median`` (weight 1) — its lower-median
    integer rule makes every comparison here exact integer
    arithmetic end-to-end, so any engine flags the identical rows.
    ``value_col`` must already be integerized (cents — the q174/q175
    convention).

    Plan: median pass (window + agg on the group key) → broadcast
    m_g back → deviation column map-side → second median pass on
    |v − m| → broadcast MAD back → integer flag map-side.  Two
    keyed median passes, no pairwise work; group count bounds the
    broadcast frames.

    Output: ``*group_cols, n, med, mad, n_outliers`` per group.
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    # rows and dev each feed a median pass AND a later join — without
    # lineage truncation every consumer re-evaluates the source scan
    # (measured 18 scans for the two-pass composition).  Both are
    # narrow (group + one value column) projections.
    rows = materialize(
        df.select(*group_cols, F.col(value_col).alias("__v")).withColumn(
            "__one", F.lit(1)
        ),
        checkpoint_mode,
    )
    med = grouped_weighted_median(rows, group_cols, "__v", "__one").select(
        *group_cols, F.col("w_median").alias("med")
    )
    dev = materialize(
        rows.join(F.broadcast(med), group_cols).withColumn(
            "__d", F.abs(F.col("__v") - F.col("med"))
        ),
        checkpoint_mode,
    )
    mad = grouped_weighted_median(
        dev.withColumn("__one2", F.lit(1)), group_cols, "__d", "__one2"
    ).select(*group_cols, F.col("w_median").alias("mad"))
    flagged = dev.join(F.broadcast(mad), group_cols).withColumn(
        "__out", (F.col("__d") > F.lit(k) * F.col("mad")).cast("int")
    )
    return (
        flagged.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum("__out").cast("long").alias("n_outliers"),
        )
    )


def trimmed_mean(
    df: DataFrame,
    group_cols: list[str],
    value_units: Column,
    trim: float = 0.1,
) -> DataFrame:
    """Symmetric trimmed mean per group over integer-coded values:
    drop the lowest and highest ``k`` observations where ``k`` is the
    LARGEST integer with ``(k/n as double) <= trim`` (exact probe —
    ``max_count_for_ratio`` — because ``floor(trim·n)`` in float can
    disagree with the ratio comparison at adversarial (trim, n)),
    then average the exact decimal sum of the middle.

    Robust-location companion to ``grouped_mad_outliers``: the
    outlier-insensitive mean the reference's sentinel scrub
    approximates by hand-listed codes.  Groups too small to keep
    anything after trimming (``n − 2k < 1``) return NULL.

    One rank window per group (both directions derived from one
    ordering), decimal-exact sum, ONE terminal division.

    Returns ``*group_cols, n, n_trimmed_each, n_kept, mean_units``.
    """
    from db_factfinder_spark.llmdata.dedup import max_count_for_ratio

    base = df.select(
        *group_cols, value_units.cast("long").alias("__v")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.asc("__v")
    )
    ranked = base.withColumn("__r", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    k = max_count_for_ratio(F.col("__n"), trim).cast("long")
    kept = ranked.withColumn("__k", k).filter(
        (F.col("__r") > F.col("__k"))
        & (F.col("__r") <= F.col("__n") - F.col("__k"))
    )
    agg = kept.groupBy(*group_cols, "__n", "__k").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("__v").cast("decimal(38,0)")).alias("__sum"),
    )
    return agg.select(
        *group_cols,
        F.col("__n").alias("n"),
        F.col("__k").alias("n_trimmed_each"),
        "n_kept",
        (
            F.col("__sum").cast("double") / F.col("n_kept").cast("double")
        ).alias("mean_units"),
    )
