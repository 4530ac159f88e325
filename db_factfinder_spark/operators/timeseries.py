"""Time-series regularization: gap filling + forward fill.

Sensor/event feeds are irregular; downstream models want one row per
(key, calendar bucket) with explicit zeros for silent buckets and the
last observation carried forward.  The reference has no time-series
surface (SURVEY.md §1.2: no timestamp types); this is part of the
extension surface for event analytics.

Scale shape: per-key day spans come from one groupBy; the calendar is
generated WITH `sequence()` *inside* each key's row (no calendar
cross-join, no driver loop), exploded, then left-joined back to the
observed buckets — both sides hash-partitioned by (key, bucket).  The
forward-fill window sorts only each key's own buckets (span-bounded,
not corpus-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per (key, day) between each key's first and last active
    day: ``n_events`` (0 on gap days), ``day_max`` (that day's max
    value, NULL on gaps), ``ff_value`` (last non-NULL day_max carried
    forward — never NULL because day one is an active day)."""
    daily = df.groupBy(
        F.col(key_col).alias("key"),
        F.to_date(ts_col).alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(value_col).alias("day_max"),
    )
    span = daily.groupBy("key").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = span.select(
        "key",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    filled = calendar.join(daily, ["key", "day"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        F.col("key").alias(key_col),
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "day_max",
        F.last("day_max", ignorenulls=True).over(w).alias("ff_value"),
    )


def twap(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average price/value per key: each observation
    holds until the next one, so its weight is the seconds to the next
    event — ``Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first)`` over each key's
    span (the final observation has no holding interval and
    contributes no weight, the standard right-open convention).  This
    is the correct average for irregular series, where the plain mean
    over-weights bursts.

    Exactness: values fold as cents (exact bigints), durations as
    whole epoch seconds, so every product and both sums are exact
    int64 — one IEEE division at the end.  Keys with a zero span
    (a single event, or every event on one timestamp) yield NULL —
    never a 0/0 NaN, whose serialization is engine-discretionary.

    One lead window + one groupBy, both on the key — a single shuffle
    (the aggregation reuses the window's hash partitioning).

    Output: ``key, n_obs, span_s, twap_c`` (TWAP in cents, double).
    """
    sec = F.col(ts_col).cast("long")
    v_c = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    stepped = df.select(
        F.col(key_col).alias("key"),
        sec.alias("t_s"),
        v_c.alias("v_c"),
    ).withColumn(
        "dur_s",
        F.lead("t_s").over(
            Window.partitionBy("key").orderBy("t_s", "v_c")
        )
        - F.col("t_s"),
    )
    return (
        stepped.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.col("v_c") * F.col("dur_s")).alias("__wsum"),
            F.sum("dur_s").alias("span_s"),
        )
        .select(
            "key",
            "n_obs",
            F.coalesce("span_s", F.lit(0)).alias("span_s"),
            F.when(
                F.col("span_s") > 0,
                F.col("__wsum").cast("double")
                / F.col("span_s").cast("double"),
            ).alias("twap_c"),
        )
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "day",
) -> DataFrame:
    """Open/high/low/close bars per (key, calendar bucket) — the
    classic series resample.  Open/close are the first/last value in
    event-time order; ties at the same timestamp break on the value
    itself (then deterministic, whatever the partitioning), encoded
    with struct-ordered ``min``/``max`` — lexicographic struct
    comparison IS argmin/argmax, computed map-side partially like any
    algebraic aggregate: one shuffle, no window, no self-join.

    Values fold as exact cents so min/max/compare are integer-exact.

    Output: ``key, bar, n, open_c, high_c, low_c, close_c``.
    """
    v_c = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    sec = F.col(ts_col).cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bar"),
        sec.alias("t_s"),
        v_c.alias("v_c"),
    )
    return (
        base.groupBy("key", "bar")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct("t_s", "v_c")).alias("__o"),
            F.max("v_c").alias("high_c"),
            F.min("v_c").alias("low_c"),
            F.max(F.struct("t_s", "v_c")).alias("__c"),
        )
        .select(
            "key",
            "bar",
            "n",
            F.col("__o.v_c").alias("open_c"),
            "high_c",
            "low_c",
            F.col("__c.v_c").alias("close_c"),
        )
    )


def cumulative_uniques(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Running count of distinct keys ever seen, per day — corpus
    growth curves, uniques-to-date dashboards.  The naive form
    (per-day COUNT DISTINCT over an expanding window) rescans
    all-history every day; the scalable identity is
    first-seen-then-cumsum: distinct-to-date(d) = Σ_{d'≤d}
    |{keys first seen on d'}| — one groupBy for first-seen days, one
    tiny (days-cardinality) cumulative window.  Exact, no sketch.

    Output: ``day, new_keys, total_keys``.
    """
    first_seen = df.groupBy(key_col).agg(
        F.to_date(F.min(ts_col)).alias("day")
    )
    per_day = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_keys")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_day.select(
        "day",
        "new_keys",
        F.sum("new_keys").over(w).alias("total_keys"),
    )


def count_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    k: int = 3,
) -> DataFrame:
    """Per-key daily-count anomaly screen — the monitoring query an
    ingest pipeline runs over its own event volumes: flag days whose
    count sits more than ``k`` population standard deviations from
    the key's mean daily count.

    Exactness: per-key daily counts c, day count n, Σc and Σc² are
    exact integers; the test |c − Σc/n| > k·σ is evaluated in the
    n-scaled form |c·n − Σc| > k·√(n·Σc² − (Σc)²) — the left side an
    exact integer, the right ONE correctly-rounded IEEE sqrt of an
    exact integer, so both engines flag identical days (no variance
    ratio, no accumulation-order float error anywhere).

    Plan: one count shuffle on (key, day), one re-agg on key, one
    broadcast join back.  Linear, partial-agg map-side at any scale;
    the integer products stay under 2⁶³ while c·n < 3·10⁹ — beyond
    that (extreme 100 TB keys), lift the two products to
    decimal(38,0) for the same exact semantics.

    Output: ``key_col, day, c, n_days, dev_n`` (= c·n − Σc),
    ``thresh`` (= k·√(n·Σc² − (Σc)²)), ``is_anomaly``.
    """
    daily = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            F.col(key_col),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = daily.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    j = daily.join(F.broadcast(stats), key_col)
    dev_n = F.col("c") * F.col("n_days") - F.col("s1")
    thresh = F.lit(float(k)) * F.sqrt(
        (F.col("n_days") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
            "double"
        )
    )
    return j.select(
        key_col,
        "day",
        "c",
        "n_days",
        dev_n.alias("dev_n"),
        thresh.alias("thresh"),
        (F.abs(dev_n).cast("double") > thresh).alias("is_anomaly"),
    )


def rolling_daily_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_days: int = 7,
) -> DataFrame:
    """Per-key rolling ``window_days``-day daily-count statistics via a
    RANGE window frame — the moving-average/volume trend every ingest
    dashboard draws, computed the way that is correct with GAPS in the
    calendar: the frame is bounded by event-TIME distance (epoch-second
    range), not by row count, so a key with missing days still averages
    over the true time window (a rowsBetween frame would silently
    stretch across gaps).

    Exactness: rolling sum and day count are exact integer window
    aggregates; the average is their single correctly-rounded IEEE
    division — no incremental float accumulation.

    Plan: one count shuffle on (key, day), then ONE window pass
    partitioned by key, ordered by day number — no self-join (the
    classic alternative joins the daily frame to itself per offset).
    The range key is a DAY COUNT from a fixed epoch date (datediff),
    never unix_timestamp — epoch seconds of a wall-clock day depend on
    the session time zone, and the driver-contract session does not
    share the engine's UTC default.

    Output: ``key_col, day, c, roll_sum, roll_days, roll_avg``.
    """
    from pyspark.sql import Window

    daily = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            F.col(key_col),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "__daynum", F.datediff(F.col("day"), F.lit("1970-01-01"))
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("__daynum")
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        key_col,
        "day",
        "c",
        F.sum("c").over(w).alias("roll_sum"),
        F.count(F.lit(1)).over(w).alias("roll_days"),
        (
            F.sum("c").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("roll_avg"),
    )


def cusum_drift(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    h: int = 4,
) -> DataFrame:
    """Per-key CUSUM drift statistic over daily counts — the
    change-POINT companion to ``count_anomalies``' spike screen: a
    slow upward level shift never trips a per-day z-test (each day is
    barely above mean) but accumulates linearly in the CUSUM, which is
    the classical sequential-detection answer (Page 1954) to "did this
    source's volume quietly double last month?".

    The textbook recursion S_t = max(0, S_{t−1} + d_t) is not
    window-expressible, but its closed form is: with P_t the prefix
    sum of deviations, S_t = P_t − min_{j≤t} P_j — so TWO window
    passes (cumulative sum, cumulative min) over the same
    (key, day-order) frame replace the sequential loop, shuffling
    once.  Zero-slack variant (no per-step k·σ drain) — S_t is the
    pure drift integrator.

    Exactness: deviations are the n-scaled integers d_t = c_t·n − Σc
    (mean-centering without division); prefix sums and mins are exact
    integer window aggregates; the decision interval h·σ_d uses the
    ONE IEEE sqrt of the exact variance numerator, σ_d =
    √(n·Σc² − (Σc)²), exactly as count_anomalies.

    Output: ``key_col, day, c, cusum_n`` (= S_t, n-scaled),
    ``thresh`` (= h·σ_d), ``drifted``.
    """
    from pyspark.sql import Window

    daily = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            F.col(key_col),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = daily.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    j = daily.join(F.broadcast(stats), key_col).withColumn(
        "__d", F.col("c") * F.col("n_days") - F.col("s1")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = j.withColumn("__p", F.sum("__d").over(w)).withColumn(
        "__pmin", F.min(F.least(F.col("__p"), F.lit(0))).over(w)
    )
    thresh = F.lit(float(h)) * F.sqrt(
        (F.col("n_days") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
            "double"
        )
    )
    cusum = F.col("__p") - F.col("__pmin")
    return p.select(
        key_col,
        "day",
        "c",
        cusum.alias("cusum_n"),
        thresh.alias("thresh"),
        (cusum.cast("double") > thresh).alias("drifted"),
    )


def ewma_dyadic(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    window_days: int = 8,
) -> DataFrame:
    """Trailing exponentially-weighted moving average with DYADIC
    weights: value at day-distance Δ (0 ≤ Δ < ``window_days``) gets
    weight 2^(window_days−1−Δ) — i.e. decay factor exactly ½ per day
    — normalised over the weights of days actually present.

    Why dyadic: the textbook recursive EWMA s_t = αx_t + (1−α)s_{t−1}
    is a sequential scan (unparallelisable, and float-accumulating in
    arrival order).  Truncating to a ``window_days`` horizon and
    pinning α so every weight is a power of two turns the whole
    statistic into two exact INTEGER window sums — num = Σ v·2^k,
    den = Σ 2^k via ``shiftleft`` on long cents — followed by one
    IEEE division: bit-reproducible on any engine, any partitioning.
    Gap-aware by construction: a missing day contributes no weight
    (the denominator shrinks), yet the decay of surviving days still
    follows true calendar distance, not row distance.

    Plan: one groupBy to the (key, day) grain (summing cents), then
    ONE range-frame window partitioned by key ordered by day number —
    the same no-self-join shape as ``rolling_daily_stats``, with the
    Δ-dependent weighting done by ``F.aggregate`` over the frame's
    collected (day, cents) structs.  The frame holds at most
    ``window_days`` structs per row — constant state, never
    corpus-bounded.

    Output: ``key_col, day_col, cents, ewma_num, ewma_den, ewma``.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy("__dn")
        .rangeBetween(-(window_days - 1), 0)
    )
    daily = df.groupBy(key_col, day_col).agg(
        F.sum(value_col).cast("long").alias("cents")
    )
    framed = daily.withColumn(
        "__dn", F.datediff(F.col(day_col), F.lit("1970-01-01"))
    ).withColumn(
        "__frame",
        F.collect_list(F.struct("__dn", "cents")).over(w),
    )
    # weight for day-distance Δ, as a literal long array indexed 1-based
    # by Δ+1 (shiftleft takes only int literals, so the powers are
    # precomputed driver-side — window_days longs, not data).
    weights = F.array(
        *[
            F.lit(1 << (window_days - 1 - d)).cast("long")
            for d in range(window_days)
        ]
    )
    def _w(s):
        return F.element_at(weights, (F.col("__dn") - s["__dn"] + 1).cast("int"))

    num = F.aggregate(
        "__frame",
        F.lit(0).cast("long"),
        lambda acc, s: acc + s["cents"] * _w(s),
    )
    den = F.aggregate(
        "__frame",
        F.lit(0).cast("long"),
        lambda acc, s: acc + _w(s),
    )
    return framed.select(
        key_col,
        day_col,
        "cents",
        num.alias("ewma_num"),
        den.alias("ewma_den"),
        (num.cast("double") / den.cast("double")).alias("ewma"),
    )


def rolling_exact_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """EXACT trailing-``window_days``-day distinct-user count per
    (key, observed day) — the precise twin of the HLL rollup (q167),
    for when the ±2% sketch answer isn't contractual enough.

    The naive exact plan re-scans every window (W-fold work) or runs
    ``approx``-free COUNT(DISTINCT) per window (a shuffle per day).
    This uses the coverage-interval identity instead: a user's
    occurrence on day o covers days [o, o+W−1] UNTIL their next
    occurrence, so exploding each distinct (key, user, day) row into
    its covered span [o, min(o+W−1, next−1)] yields each user AT MOST
    ONCE per covered day — the per-day row count IS the distinct
    count, no DISTINCT needed after the explode.  Work is bounded by
    W × distinct user-days, all equi-shuffles.

    Output: ``key_col, day (date), u`` for each day the key was
    actually observed, ``u`` = exact distinct users in the trailing
    window.
    """
    occ = (
        df.filter(
            F.col(ts_col).isNotNull()
            & F.col(key_col).isNotNull()
            & F.col(user_col).isNotNull()
        )
        .select(
            key_col,
            user_col,
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).alias("__dn"),
        )
        .distinct()
    )
    w = Window.partitionBy(key_col, user_col).orderBy("__dn")
    covered = (
        occ.withColumn("__next", F.lead("__dn").over(w))
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("__dn"),
                    F.least(
                        F.col("__dn") + (window_days - 1),
                        F.coalesce(
                            F.col("__next") - 1,
                            F.col("__dn") + (window_days - 1),
                        ),
                    ),
                )
            ).alias("__d"),
        )
    )
    counts = covered.groupBy(key_col, "__d").agg(
        F.count(F.lit(1)).alias("u")
    )
    observed = occ.select(key_col, F.col("__dn").alias("__d")).distinct()
    return counts.join(observed, [key_col, "__d"]).select(
        key_col,
        F.date_add(F.to_date(F.lit("1970-01-01")), F.col("__d").cast("int"))
        .alias("day"),
        "u",
    )


def interpolate_daily_linear(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Fill interior calendar gaps of each key's daily long-valued
    series by LINEAR interpolation between the surrounding
    observations — the regularization step models want when a flat
    zero (``gap_fill_daily``) or a held value (forward fill) would
    bias the series.

    For a gap day at distance Δ inside an observed span (p, v_p) →
    (n, v_n) of length g = n − p:

        v = (v_p·g + (v_n − v_p)·Δ) / g

    numerator and denominator exact longs, ONE IEEE division — the
    same single-rounding exactness rule as every ratio in the repo.
    Endpoints are never extrapolated.  One lead window per key plus a
    per-gap ``sequence`` explode (bounded by the key's own span),
    then a union with the observed rows — no calendar cross-join.

    Output: ``key_col, day (date), val (double), is_interp``.
    """
    base = df.select(
        key_col,
        F.datediff(F.col(day_col), F.lit("1970-01-01")).alias("__dn"),
        F.col(value_col).cast("long").alias("__v"),
    )
    w = Window.partitionBy(key_col).orderBy("__dn")
    nxt = base.withColumn("__ndn", F.lead("__dn").over(w)).withColumn(
        "__nv", F.lead("__v").over(w)
    )
    gaps = (
        nxt.filter(
            F.col("__ndn").isNotNull() & (F.col("__ndn") > F.col("__dn") + 1)
        )
        .select(
            key_col,
            "__dn",
            "__v",
            "__ndn",
            "__nv",
            F.explode(
                F.sequence(F.col("__dn") + 1, F.col("__ndn") - 1)
            ).alias("__d"),
        )
        .select(
            key_col,
            F.col("__d"),
            (
                (
                    F.col("__v") * (F.col("__ndn") - F.col("__dn"))
                    + (F.col("__nv") - F.col("__v"))
                    * (F.col("__d") - F.col("__dn"))
                ).cast("double")
                / (F.col("__ndn") - F.col("__dn")).cast("double")
            ).alias("val"),
            F.lit(True).alias("is_interp"),
        )
    )
    observed = base.select(
        key_col,
        F.col("__dn").alias("__d"),
        F.col("__v").cast("double").alias("val"),
        F.lit(False).alias("is_interp"),
    )
    return observed.unionByName(gaps).select(
        key_col,
        F.date_add(F.to_date(F.lit("1970-01-01")), F.col("__d").cast("int"))
        .alias("day"),
        "val",
        "is_interp",
    )


def seasonal_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    k: int = 3,
) -> DataFrame:
    """Day-of-week-seasonal twin of ``count_anomalies``: each daily
    count is tested against the baseline of ITS OWN weekday for the
    key, so a quiet Sunday stops tripping the flat-mean alarm and a
    Sunday-sized Tuesday correctly does.

    Same n-scaled exact-integer test, per (key, weekday) cell:
    |c·n − Σc| > k·√(n·Σc² − (Σc)²), the √ being the ONE IEEE op.
    The weekday is computed portably as ``day_number mod 7`` from the
    1970-01-01 epoch (0 = Thursday) — engine date-function weekday
    conventions (Sunday-0 vs Monday-1) never enter the plan.

    Plan: one (key, day) count shuffle, one (key, dow) stats groupBy
    (≤ 7 rows per key — broadcast back), linear and partial-agg
    map-side.  Output: ``key_col, day, dow, c, n_days, dev_n,
    thresh, is_anomaly``.
    """
    daily = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            key_col,
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).alias("__dn"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("dow", F.col("__dn") % 7)
    )
    stats = daily.groupBy(key_col, "dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("__s1"),
        F.sum(F.col("c") * F.col("c")).alias("__s2"),
    )
    j = daily.join(F.broadcast(stats), [key_col, "dow"])
    dev_n = F.col("c") * F.col("n_days") - F.col("__s1")
    thresh = F.lit(float(k)) * F.sqrt(
        (
            F.col("n_days") * F.col("__s2") - F.col("__s1") * F.col("__s1")
        ).cast("double")
    )
    return j.select(
        key_col,
        F.date_add(F.to_date(F.lit("1970-01-01")), F.col("__dn").cast("int"))
        .alias("day"),
        "dow",
        "c",
        "n_days",
        dev_n.alias("dev_n"),
        thresh.alias("thresh"),
        (F.abs(dev_n).cast("double") > thresh).alias("is_anomaly"),
    )


def dispersion_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Burstiness audit of each key's daily-count series: Fano factor
    (variance / mean) and squared coefficient of variation — the two
    standard dispersion indices behind "is this feed Poisson-like or
    bursty?".  A Poisson process has Fano ≈ 1; boilerplate floods and
    bot traffic push it far above.

    With n days, S₁ = Σc and S₂ = Σc² (exact integers):

        fano = (n·S₂ − S₁²) / (n·S₁)        (population var / mean)
        cv²  = (n·S₂ − S₁²) / S₁²

    each ONE IEEE division of exact integers — no sqrt anywhere, so
    every engine agrees bit-for-bit.  The over-dispersion flag is
    decided in pure integers (n·S₂ − S₁² > n·S₁ ⟺ var > mean).
    Keys with zero total count yield NULL ratios, never a division
    error.

    One count shuffle + one stats groupBy; constant output per key.
    Output: ``key_col, n_days, total, fano, cv2, overdispersed``.
    """
    daily = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            key_col,
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).alias("__dn"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = daily.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("__s2"),
    )
    var_n2 = (
        F.col("n_days") * F.col("__s2") - F.col("total") * F.col("total")
    )
    return stats.select(
        key_col,
        "n_days",
        "total",
        F.when(
            F.col("total") > 0,
            var_n2.cast("double")
            / (F.col("n_days") * F.col("total")).cast("double"),
        ).alias("fano"),
        F.when(
            F.col("total") > 0,
            var_n2.cast("double")
            / (F.col("total") * F.col("total")).cast("double"),
        ).alias("cv2"),
        (var_n2 > F.col("n_days") * F.col("total")).alias("overdispersed"),
    )


def rising_trend(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    recent_days: int = 3,
) -> DataFrame:
    """Rising-entity detector: each (key, day)'s trailing
    ``recent_days`` count against the IMMEDIATELY PRECEDING
    ``recent_days`` window — the week-over-week "what's trending"
    monitor, as two OFFSET range frames over one daily aggregate
    (``rolling_daily_stats`` knows one trailing frame; the prior
    window here is the RANGE BETWEEN 2r−1 PRECEDING AND r PRECEDING
    frame, gap-correct by day distance).

    The smoothed ratio (c_recent+1)/(c_prior+1) is one exact-integer
    division; the ``rising`` flag is decided in pure integers,
    2·c_recent > 3·c_prior (≥ 50% growth), so no float share ever
    tips a boundary day.

    Plan: one (key, day) count shuffle, ONE window pass (both frames
    share the partition/order), no self-join.  Output: ``key_col,
    day, c, c_recent, c_prior, ratio, rising``.
    """
    if recent_days < 1:
        raise ValueError("recent_days must be >= 1")
    daily = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            key_col,
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).alias("__dn"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    base = Window.partitionBy(key_col).orderBy("__dn")
    w_r = base.rangeBetween(-(recent_days - 1), 0)
    w_p = base.rangeBetween(-(2 * recent_days - 1), -recent_days)
    c_r = F.sum("c").over(w_r).cast("long")
    c_p = F.coalesce(F.sum("c").over(w_p), F.lit(0)).cast("long")
    return daily.select(
        key_col,
        F.date_add(F.to_date(F.lit("1970-01-01")), F.col("__dn").cast("int"))
        .alias("day"),
        "c",
        c_r.alias("c_recent"),
        c_p.alias("c_prior"),
        (
            (c_r + 1).cast("double") / (c_p + 1).cast("double")
        ).alias("ratio"),
        (2 * c_r > 3 * c_p).alias("rising"),
    )


def audience_overlap(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Day-pair audience overlap: for every ordered pair of observed
    days, the exact Jaccard of their active-user sets — the
    retention/cannibalization matrix ("how much of Tuesday's audience
    was also there Monday").

    The identity that keeps it off the users² cliff: intersections
    come from the per-USER day-pair explode — a user active on d days
    contributes C(d, 2) pairs, bounded by the calendar, never by the
    user count — and |A∪B| = |A| + |B| − |A∩B| completes Jaccard
    without ever materializing union sets.  One distinct shuffle, one
    keyed self-join on the user, two broadcast size joins; exact-int
    ratio, one division.

    Output: ``day_a < day_b, n_a, n_b, n_inter, jaccard`` — day pairs
    with an empty intersection are absent (their Jaccard is 0).
    """
    ud = (
        df.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("u"), F.to_date(ts_col).alias("day")
        )
        .distinct()
    )
    sizes = ud.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    l_ = ud.select("u", F.col("day").alias("day_a"))
    r_ = ud.select("u", F.col("day").alias("day_b"))
    inter = (
        l_.join(r_, "u")
        .filter(F.col("day_a") < F.col("day_b"))
        .groupBy("day_a", "day_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("day").alias("day_a"),
                                     F.col("n").alias("n_a"))),
            "day_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("day").alias("day_b"),
                                     F.col("n").alias("n_b"))),
            "day_b",
        )
        .select(
            "day_a", "day_b", "n_a", "n_b", "n_inter",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
                .cast("double")
            ).alias("jaccard"),
        )
    )


def business_days_between(start: Column, end: Column) -> Column:
    """Weekday count in [start, end) — closed-form, no calendar table,
    no UDF, no iteration: with day numbers Monday-anchored
    (``datediff(d, 1970-01-01) + 3``; 1970-01-01 was a Thursday), the
    weekdays-before-day-x function is g(x) = (x div 7)·5 +
    least(x mod 7, 5), and the answer is g(end) − g(start).  Pure
    integer expressions, validated against a day-walk brute force
    over 2000 random ranges; negative when end < start (g is
    monotone, so the difference is the signed weekday count).

    The SLA-lag primitive: "shipped within 3 business days" at any
    scale as one map-side expression."""
    def g(d: Column) -> Column:
        x = F.datediff(d, F.lit("1970-01-01")) + F.lit(3)
        return (
            F.floor(x / 7) * F.lit(5)
            + F.least(x % 7, F.lit(5))
        ).cast("long")

    return g(end) - g(start)


def activity_bitmap(
    df: DataFrame,
    key_col: str,
    date_col: str,
    window_days: int = 63,
) -> DataFrame:
    """Per-key daily-activity BITMAP over the trailing
    ``window_days`` (≤ 63) ending at the dataset's max date: bit i set
    ⇔ active i days before the anchor.  The engagement-state
    representation warehouses keep per user because it is 8 BYTES per
    key (vs a row per active day), merges across loads by bitwise OR
    (algebraic, like the sketches), and answers count and streak
    questions with pure integer ops:

    * ``n_active`` = ``bit_count(mask)``;
    * ``longest_streak`` = iterations of ``m ← m & (m << 1)`` until 0
      — each AND-shift shortens every run by one, so the iteration
      count is the longest run.  Implemented as ONE ``aggregate``
      fold over ``sequence(1, 63)`` whose state carries (mask, count):
      a naive chain of 63 ``m & (m << 1)`` Column expressions
      duplicates its subtree per step (Catalyst trees, not DAGs —
      2^63 nodes); the fold's lambda references its accumulator once,
      so the plan stays linear.

    One bit_or aggregation per key + a scalar max-date broadcast.
    The oracle checks streaks with the INDEPENDENT gaps-and-islands
    algorithm (row_number difference grouping) — two different
    algorithms agreeing on every key.

    Output: ``key, mask, n_active, longest_streak``.
    """
    if not 1 <= window_days <= 63:
        raise ValueError("window_days must be in [1, 63]")
    sel = df.select(
        F.col(key_col).alias("k"),
        F.to_date(F.col(date_col)).alias("d"),
    ).filter(F.col("d").isNotNull() & F.col("k").isNotNull())
    anchor = sel.agg(F.max("d").alias("__maxd"))
    idx = F.datediff(F.col("__maxd"), F.col("d"))
    masks = (
        sel.crossJoin(F.broadcast(anchor))
        .filter(idx < window_days)
        .select(
            "k",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"datediff(__maxd, d))"
            ).alias("__bit"),
        )
        .groupBy("k")
        .agg(F.bit_or("__bit").alias("mask"))
    )
    streak = F.expr(
        "aggregate(sequence(1, 63), "
        "struct(mask AS m, CAST(0 AS INT) AS c), "
        "(acc, i) -> struct(acc.m & shiftleft(acc.m, 1) AS m, "
        "acc.c + IF(acc.m != 0, 1, 0) AS c)).c"
    )
    return masks.select(
        F.col("k").alias(key_col),
        "mask",
        F.bit_count("mask").alias("n_active"),
        streak.alias("longest_streak"),
    )


def semi_additive_last(
    df: DataFrame,
    key_col: str,
    period_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Semi-additive measure rollup: a balance-like ``value_col`` sums
    across ``key_col`` (accounts) but NOT across time — each account
    contributes its LAST observation within a period.  Returns one row
    per ``period_col``: ``period, balance_total, n_accounts``.

    The warehouse-classic LAST_VALUE pitfall is frame-dependence;
    instead each (key, period)'s last row is picked by one descending
    row_number over ``(ts, tiebreak)`` — total order, so the choice is
    partition-invariant — then a plain sum over accounts.  One shuffle
    on (key, period) for the window, one on period for the rollup.
    Balances aggregate through decimal(18,2), never a double sum, so
    the total is exact and ordering-independent; the cast back to
    double is presentation only.
    """
    w = Window.partitionBy(key_col, period_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    last = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(period_col),
            F.col(value_col).cast("decimal(18,2)").alias("__bal"),
        )
    )
    return last.groupBy(period_col).agg(
        F.sum("__bal").cast("double").alias("balance_total"),
        F.count(F.lit(1)).alias("n_accounts"),
    )


def sax_symbols(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    n_segments: int = 8,
    alphabet: int = 4,
) -> DataFrame:
    """SAX-style series symbolization with empirical breakpoints.

    Piecewise Aggregate Approximation + discretization (Lin et al.
    2003): each key's ordered series is cut into ``n_segments``
    equal-count segments, each segment reduced to its mean, and the
    means discretized into an ``alphabet``-letter word — the compact
    shape signature motif mining / series clustering runs on instead
    of the raw points.  Two departures keep it exact and
    oracle-checkable: breakpoints are *empirical* per-series
    (rank-equiprobable over the segment means — the equal-frequency
    variant, not the Gaussian table, so no normal-quantile float
    constants), and every statistic is exact-int until the single
    per-segment IEEE division for the mean, whose double is the same
    bit pattern in any engine given the same (sum, count).

    Returns ``{key_col}, n_points, sax`` where ``sax`` is the word as
    a digit string ('0' = lowest band).  Rows with fewer points than
    ``n_segments`` still produce a (shorter-alphabet-resolution) word
    over however many non-empty segments they have.

    Scale: two window passes over the same (key, order) partitioning —
    Spark reuses the sort — plus one groupBy per reduction; no state
    beyond n_segments rows per key after the first aggregate.
    ``value_col`` must already be an exact integer (fixed-point the
    caller's doubles).
    """
    wn = Window.partitionBy("__k").orderBy(order_col)
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(order_col).alias(order_col),
        F.col(value_col).cast("long").alias("__v"),
    )
    counted = base.withColumn("__rn", F.row_number().over(wn)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("__k"))
    )
    seg = counted.select(
        "__k",
        "__n",
        F.expr(f"(__rn - 1) * {n_segments} DIV __n").alias("__seg"),
        "__v",
    )
    means = seg.groupBy("__k", "__n", "__seg").agg(
        (F.sum("__v") / F.count(F.lit(1))).alias("__mean")
    )
    wseg = Window.partitionBy("__k")
    wrank = Window.partitionBy("__k").orderBy("__mean", "__seg")
    banded = (
        means.withColumn("__nseg", F.count(F.lit(1)).over(wseg))
        .withColumn("__rk", F.row_number().over(wrank))
        .withColumn(
            "__band",
            F.expr(f"(__rk - 1) * {alphabet} DIV __nseg"),
        )
    )
    return (
        banded.groupBy("__k", "__n")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("__seg", "__band"))
                    ),
                    lambda s: s["__band"].cast("string"),
                ),
            ).alias("sax")
        )
        .select(
            F.col("__k").alias(key_col),
            F.col("__n").alias("n_points"),
            "sax",
        )
    )


def watermark_lateness_audit(
    df: DataFrame,
    key_col: str,
    event_ts_col: str,
    arrival_col: str,
    delays: list[int],
) -> DataFrame:
    """How late does this stream actually run?  The sizing study for
    a Structured Streaming watermark, computed from history.

    An event is DROPPED at watermark delay *d* iff the maximum event
    time already seen on its key when it arrives exceeds its own event
    time by more than *d* — so the audit is one running max over
    ARRIVAL order (a different order than event time: that disorder is
    the whole phenomenon) and one comparison per candidate delay.
    Feeding it the proposed delays answers "what loss rate does a
    5-minute watermark buy me" before any streaming job restarts.

    ``event_ts_col``/``arrival_col``/``delays`` are exact integers in
    the caller's unit.  Returns one row per delay: ``delay, n_late,
    n_events`` (``n_late`` = events strictly later than ``delay``).

    Scale: one window pass partitioned by key (per-key arrival order
    is what a partitioned source preserves), then a single aggregate
    — the delay sweep is a fixed-width column list, not a join.
    """
    if not delays:
        raise ValueError("delays must be non-empty")
    w = (
        Window.partitionBy(key_col)
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = df.select(
        (
            F.max(F.col(event_ts_col)).over(w) - F.col(event_ts_col)
        ).alias("__late")
    )
    aggs = [F.count(F.lit(1)).alias("n_events")] + [
        F.sum(F.when(F.col("__late") > d, 1).otherwise(0)).alias(
            f"late_{d}"
        )
        for d in delays
    ]
    wide = late.agg(*aggs)
    rows = [
        wide.select(
            F.lit(d).alias("delay"),
            F.col(f"late_{d}").alias("n_late"),
            F.col("n_events"),
        )
        for d in delays
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def slo_burn_alerts(
    daily: DataFrame,
    day_col: str,
    err_col: str,
    total_col: str,
    slo_num: int,
    slo_den: int,
    burn_factor: int,
    short_days: int,
    long_days: int,
) -> DataFrame:
    """Multiwindow SLO burn-rate alerting (the SRE-workbook policy)
    in exact integers.

    With an error budget of ``slo_num/slo_den`` of requests, the burn
    rate over a window is ``err_W / (total_W · budget)``; the alert
    fires when BOTH the short and the long window burn faster than
    ``burn_factor`` — short for responsiveness, long to suppress
    blips.  Every comparison is the cross-multiplication
    ``err_W · slo_den > burn_factor · slo_num · total_W`` — no float
    rates anywhere, so alert edges are bit-stable.

    ``daily`` is one row per (integer day) with exact counts; windows
    are RANGE frames on the day value, so missing days shrink the
    window correctly instead of silently stretching it (the ROWS-frame
    bug).  Returns per day: the window sums, per-window burn booleans,
    and ``alert``.
    """
    def frame(days: int):
        return (
            Window.orderBy(F.col(day_col))
            .rangeBetween(-(days - 1), 0)
        )

    out = daily.select(
        day_col,
        F.col(err_col).cast("long").alias("e"),
        F.col(total_col).cast("long").alias("t"),
    )
    for tag, days in (("short", short_days), ("long", long_days)):
        w = frame(days)
        out = out.withColumn(
            f"err_{tag}", F.sum("e").over(w)
        ).withColumn(f"tot_{tag}", F.sum("t").over(w))
    burn = lambda tag: (  # noqa: E731 — exact cross-multiplied rate
        F.col(f"err_{tag}") * F.lit(slo_den)
        > F.lit(burn_factor * slo_num) * F.col(f"tot_{tag}")
    )
    return out.select(
        day_col,
        "err_short", "tot_short", "err_long", "tot_long",
        burn("short").alias("burn_short"),
        burn("long").alias("burn_long"),
        (burn("short") & burn("long")).alias("alert"),
    )
