"""Product-analytics operators over event streams: cohort retention
and funnel (A→B within horizon) conversion.

Both are linear, single-key-shuffle formulations of queries that are
usually written as self-joins.  At 100 TB a per-user inequality
self-join (clicks × later purchases) explodes quadratically inside
hot users; the forward-carry window form touches each event once and
partitions by the user key like any keyed aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Weekly cohort retention triangle: users bucket into the week of
    their first activity (Monday-truncated) and each (cohort_week,
    offset_weeks) cell counts the distinct users active that many
    weeks after their cohort week.

    Plan: distinct (user, week) → per-user min → join back on the user
    key → count-distinct per cell.  Every shuffle keys on the user (or
    the tiny cell key); no self-join, no window over raw events.  The
    distinct frame is materialized once (per ``checkpoint_mode``) —
    it feeds both the cohort roll-up and the join probe side, and
    inline the scan+distinct would run twice over the raw events.
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    weeks = materialize(
        df.select(
            F.col(user_col),
            F.date_trunc("week", F.col(ts_col)).alias("week"),
        ).distinct(),
        checkpoint_mode,
    )
    first = weeks.groupBy(user_col).agg(F.min("week").alias("cohort_week"))
    joined = weeks.join(first, user_col)
    offset = F.floor(
        F.datediff(F.col("week"), F.col("cohort_week")) / 7
    ).cast("int")
    return (
        joined.withColumn("offset_weeks", offset)
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def next_event_within(
    from_df: DataFrame,
    to_df: DataFrame,
    by: str,
    on: str,
    horizon_us: int,
) -> DataFrame:
    """For every ``from_df`` row, the timestamp of the nearest
    ``to_df`` row at-or-after it (same ``by`` key) and whether it
    falls within ``horizon_us`` microseconds — the funnel-step
    primitive ("purchase within 1 h of click").

    Forward as-of via the union-window form (mirrors operators/asof
    backward logic, scanned in DESCENDING time): one shuffle on the
    key, linear in rows.  Ties (target at the identical timestamp)
    count as converted — the target sorts before the probe in the
    descending scan.
    """
    from_cols = from_df.columns
    p = from_df.withColumns(
        {"__is_probe": F.lit(1), "__t": F.lit(None).cast("long")}
    )
    t = to_df.select(
        F.col(by),
        F.col(on),
        F.unix_micros(F.col(on)).alias("__t"),
        F.lit(0).alias("__is_probe"),
    )
    u = p.unionByName(t, allowMissingColumns=True)
    # descending scan: rows seen earlier are LATER in time; the last
    # target timestamp carried is the smallest one ≥ the probe's
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).desc(), F.col("__is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.last("__t", ignorenulls=True).over(w)
    return (
        u.withColumn("__next", nxt)
        .filter(F.col("__is_probe") == 1)
        .select(
            *from_cols,
            F.timestamp_micros(F.col("__next")).alias("next_ts"),
            (
                F.col("__next").isNotNull()
                & ((F.col("__next") - F.unix_micros(F.col(on))) <= horizon_us)
            ).alias("converted"),
        )
    )


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts and probabilities over
    each key's event sequence — the behavioral-model summary behind
    next-action prediction and funnel-leak diagnosis.

    Each user's events order by (ts, tiebreak); consecutive pairs
    (state → next) count into the matrix; P(next | state) =
    pair_count / row_total is an exact-integer ratio.  One lead
    window + one groupBy — both shuffle on the key/state.  The
    tiebreak column is REQUIRED for reproducibility: without it,
    same-timestamp events order arbitrarily per run.

    Output: ``state, next, n_trans, n_from, p`` sorted by state/next.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    steps = (
        events.filter(
            F.col(ts_col).isNotNull() & F.col(event_col).isNotNull()
        )
        .withColumn("__next", F.lead(event_col).over(w))
        .filter(F.col("__next").isNotNull())
        .select(F.col(event_col).alias("state"), F.col("__next").alias("next"))
    )
    counts = steps.groupBy("state", "next").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    totals = counts.groupBy("state").agg(
        F.sum("n_trans").alias("n_from")
    )
    return (
        counts.join(totals, "state")
        .select(
            "state",
            "next",
            "n_trans",
            "n_from",
            (
                F.col("n_trans").cast("double")
                / F.col("n_from").cast("double")
            ).alias("p"),
        )
    )


def _assigned_touches(
    events: DataFrame,
    touch_types: list[str],
    conv_type: str,
    horizon_us: int,
    channel: Column,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    checkpoint_mode: str = "local",
) -> tuple[DataFrame, DataFrame]:
    """Shared touch→next-conversion assignment behind the attribution
    family (linear / U-shaped): the union-frame descending-time window
    of ``next_event_within`` — one shuffle on the key, linear, never
    the touch×conversion inequality self-join.  Returns ``(assigned,
    conv)``: qualifying touches labeled with their conversion's
    (id, cents), and the conversion frame (for the direct channel).

    Both multi-consumer frames are MATERIALIZED per ``checkpoint_mode``
    (``llmdata.checkpointing``; r12, guide §2.4): the narrow event
    projection feeds the touch slice, the conversion slice AND the
    direct-channel anti-join (pre-r12 the source was re-scanned per
    reference), and ``assigned`` feeds the credit windows AND the
    direct anti-join (pre-r12 the whole union+descending-window
    pipeline re-ran per reference — the markov_attribution pattern,
    OPTIMIZATION_r11.md checklist row "attribution family")."""
    from db_factfinder_spark.llmdata.checkpointing import materialize

    e = materialize(
        events.select(
            F.col(key_col).alias("k"),
            F.unix_micros(F.col(ts_col)).alias("us"),
            F.col(id_col).alias("eid"),
            "event_type",
            F.floor(F.col(value_col) * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            channel.alias("channel"),
        ),
        checkpoint_mode,
    )
    conv = e.filter(F.col("event_type") == conv_type).select(
        "k", "us", "eid", "cents",
        F.lit(0).alias("__is_probe"),
    )
    touch = e.filter(F.col("event_type").isin(*touch_types)).select(
        "k", "us", "eid", "channel",
        F.lit(1).alias("__is_probe"),
    )
    u = touch.unionByName(
        conv.select(
            "k", "us", "eid", "__is_probe",
            F.struct("us", "eid", "cents").alias("__conv"),
        ),
        allowMissingColumns=True,
    )
    # descending scan: among conversions at-or-after the touch, the
    # carried struct is the (us, eid)-smallest — conversions sort
    # before probes at equal us, so a same-instant conversion counts.
    w = (
        Window.partitionBy("k")
        .orderBy(
            F.col("us").desc(), F.col("__is_probe").asc(),
            F.col("eid").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = materialize(
        u.withColumn("__next", F.last("__conv", ignorenulls=True).over(w))
        .filter(
            (F.col("__is_probe") == 1)
            & F.col("__next").isNotNull()
            & ((F.col("__next.us") - F.col("us")) <= F.lit(horizon_us))
        )
        .select(
            F.col("__next.eid").alias("conv_id"),
            F.col("__next.cents").alias("cents"),
            "us", "eid", "channel",
        ),
        checkpoint_mode,
    )
    return assigned, conv


def linear_attribution(
    events: DataFrame,
    touch_types: list[str],
    conv_type: str,
    horizon_us: int,
    channel: Column,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Linear multi-touch attribution with EXACT cent conservation.

    Every conversion's value splits equally across the touch events
    that precede it (same key, at-or-before by time, within
    ``horizon_us``); conversions with no qualifying touch credit a
    synthetic channel −1 ("direct").  Naive equal-split divides
    cents/n per touch and leaks fractions of a cent per conversion —
    at ledger scale the books stop balancing.  This operator uses the
    largest-remainder rule instead: each touch gets ``cents div n``
    and the first ``cents mod n`` touches (in (ts, id) order) get one
    extra cent, so ``Σ credited ≡ Σ conversion value`` EXACTLY — the
    conservation law the unit tests pin.

    Plan: the touch→next-conversion assignment is the same
    union-frame descending-time window as ``next_event_within`` (one
    shuffle on the key, linear — never the touch×conversion
    inequality self-join); the split is one window pair (count +
    row_number) keyed by the conversion id; credits aggregate by
    channel in integer cents.

    Output: ``channel, n_credits, credited_cents``.

    ``checkpoint_mode`` — lineage-truncation policy for the shared
    assignment frames (``llmdata.checkpointing``): ``"local"``
    (default) / ``"reliable"`` / ``"none"``.  The default
    ``localCheckpoint`` blocks stay pinned on executors for the
    session; loop-heavy long-lived sessions should pass
    ``"reliable"`` or ``"none"``.
    """
    assigned, conv = _assigned_touches(
        events, touch_types, conv_type, horizon_us, channel,
        key_col, ts_col, id_col, value_col, checkpoint_mode,
    )
    per_conv = Window.partitionBy("conv_id")
    order = Window.partitionBy("conv_id").orderBy("us", "eid")
    # both engines truncate integer division toward zero, so the
    # remainder carries the dividend's sign; the first |rem| touches
    # absorb one signed extra cent each — conservation holds for
    # refunds (negative value) too, not just purchases
    rem = F.col("cents") % F.col("n")
    extra = F.when(
        F.col("rn") <= F.abs(rem),
        F.when(rem > 0, F.lit(1)).when(rem < 0, F.lit(-1)).otherwise(0),
    ).otherwise(F.lit(0))
    credits = (
        assigned.withColumn("n", F.count(F.lit(1)).over(per_conv))
        .withColumn("rn", F.row_number().over(order))
        .select(
            "channel",
            (F.expr("cents div n") + extra.cast("long")).alias("credit"),
        )
    )
    direct = (
        conv.join(
            assigned.select("conv_id").distinct(),
            conv["eid"] == F.col("conv_id"),
            "left_anti",
        )
        .select(F.lit(-1).alias("channel"), F.col("cents").alias("credit"))
    )
    return (
        credits.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit").alias("credited_cents"),
        )
    )


def event_runs(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Run-length encoding of each key's event sequence — the
    gaps-and-islands compression behind "user clicked 5× then
    purchased" behavioral summaries and repeated-state anomaly checks
    (a 400-long run of 'error' is a stuck client).

    Classic two-window form over ONE partitioning: a lag-inequality
    flag marks run starts, its running sum numbers the runs, and a
    groupBy on (key, run) collapses each island to state, length,
    and [first, last] event times (epoch micros — exact integers).
    Both windows and the final aggregate shuffle on the same user key
    once; runs compress the stream so the output is bounded by
    state-change count, not event count.

    Output: ``<key_col>, run_seq, state, run_len, start_us, end_us``.
    """
    base = events.select(
        F.col(key_col),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        F.col(tiebreak_col).alias("__tb"),
        F.col(state_col).alias("state"),
    )
    w = Window.partitionBy(key_col).orderBy("__us", "__tb")
    start_flag = F.when(
        F.lag("state").over(w).eqNullSafe(F.col("state")),
        F.lit(0),
    ).otherwise(F.lit(1))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = base.withColumn("__new", start_flag).withColumn(
        "run_seq", F.sum("__new").over(wrun)
    )
    return runs.groupBy(key_col, "run_seq").agg(
        # state is constant within a run; min() is the deterministic pick
        F.min("state").alias("state"),
        F.count(F.lit(1)).alias("run_len"),
        F.min("__us").alias("start_us"),
        F.max("__us").alias("end_us"),
    )


def sequential_pairs(
    events: DataFrame,
    max_gap: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
    with_support: bool = True,
) -> DataFrame:
    """Gap-constrained sequential pattern counts: for every ordered
    event pair (a → b), how often b follows a within ``max_gap``
    sequence positions of the same key — the length-2 stage of
    GSP/PrefixSpan sequential-pattern mining (Srikant & Agrawal,
    EDBT'96), and a strict generalisation of ``transition_matrix``
    (which is the ``max_gap=1`` slice).

    The naive plan self-joins each key's sequence to itself under a
    position-range predicate — a shuffle join whose output the
    optimizer can't bound.  Because the gap is a small constant,
    ``lead(event, k)`` for k = 1..max_gap replaces the join entirely:
    ONE window pass emits every successor within the gap as columns,
    a bounded array unpivot turns them into rows, and one groupBy
    counts.  Work is rows × max_gap, never rows², and nothing
    shuffles except the window's key partition and the final count.

    Output: ``a, b, n_pairs`` (total gap-≤ occurrences) and — when
    ``with_support`` — ``n_keys`` (distinct keys exhibiting the
    pattern, the sequence SUPPORT in the mining sense).  Pass
    ``with_support=False`` when only counts are needed: COUNT
    DISTINCT plans an expand over the pair stream (2× shuffle bytes),
    which a corpus-scale caller like ``skipgram_counts`` shouldn't
    pay for a column it drops.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    seq = events.filter(
        F.col(ts_col).isNotNull() & F.col(event_col).isNotNull()
    )
    succ = seq.select(
        F.col(key_col).alias("__k"),
        F.col(event_col).alias("a"),
        F.array(
            *[F.lead(event_col, k).over(w) for k in range(1, max_gap + 1)]
        ).alias("__succ"),
    )
    pairs = succ.select(
        "__k", "a", F.explode("__succ").alias("b")
    ).filter(F.col("b").isNotNull())
    aggs = [F.count(F.lit(1)).alias("n_pairs")]
    if with_support:
        aggs.append(F.countDistinct("__k").alias("n_keys"))
    return pairs.groupBy("a", "b").agg(*aggs)


def time_decay_attribution(
    events: DataFrame,
    touch_types: list[str],
    conv_type: str,
    horizon_days: int,
    channel: Column,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Time-decay multi-touch attribution (half-life = 1 day) with
    EXACT cent conservation — the recency-weighted sibling of
    ``linear_attribution``.

    A touch aged ``d`` whole days at conversion time carries weight
    2^(horizon_days − d): all weights are exact integer powers of two
    (the dyadic-weight trick of ``ewma_dyadic`` — no libm ``pow``
    anywhere), so per conversion the credit of touch i is the exact
    rational cents·wᵢ/W.  Integer floor credits leave a residual of at
    most n−1 cents, assigned by the largest-remainder rule (|rem|
    desc, then (ts, id) — deterministic), so ``Σ credited ≡ Σ
    conversion cents`` EXACTLY, refunds included (every remainder
    carries the dividend's sign, mirroring ``linear_attribution``).

    Plan shape: identical to ``linear_attribution`` — one union-frame
    descending-time window on the user key assigns each touch its next
    conversion (never a touch×conversion inequality join), then two
    windows keyed by conversion id compute W, the running base sum,
    and the remainder ranks.  ``horizon_days ≤ 40`` keeps
    ``cents·2^horizon`` comfortably inside int64 for ledger-scale
    cents.

    Output: ``channel, n_credits, credited_cents``.

    ``checkpoint_mode`` — lineage-truncation policy for the shared
    assignment frames (``llmdata.checkpointing``): ``"local"``
    (default) / ``"reliable"`` / ``"none"``.  The default
    ``localCheckpoint`` blocks stay pinned on executors for the
    session; loop-heavy long-lived sessions should pass
    ``"reliable"`` or ``"none"``.
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    if not 0 <= horizon_days <= 40:
        raise ValueError("horizon_days must be in [0, 40]")
    day_us = 86_400_000_000
    horizon_us = horizon_days * day_us
    # same two multi-consumer materializations as _assigned_touches
    # (r12): the narrow projection feeds touch + conv + direct, the
    # assigned frame feeds the credit windows + the direct anti-join
    e = materialize(
        events.select(
            F.col(key_col).alias("k"),
            F.unix_micros(F.col(ts_col)).alias("us"),
            F.col(id_col).alias("eid"),
            "event_type",
            F.floor(F.col(value_col) * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            channel.alias("channel"),
        ),
        checkpoint_mode,
    )
    conv = e.filter(F.col("event_type") == conv_type).select(
        "k", "us", "eid", "cents", F.lit(0).alias("__is_probe")
    )
    touch = e.filter(F.col("event_type").isin(*touch_types)).select(
        "k", "us", "eid", "channel", F.lit(1).alias("__is_probe")
    )
    u = touch.unionByName(
        conv.select(
            "k", "us", "eid", "__is_probe",
            F.struct("us", "eid", "cents").alias("__conv"),
        ),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy("k")
        .orderBy(
            F.col("us").desc(), F.col("__is_probe").asc(),
            F.col("eid").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = materialize(
        u.withColumn("__next", F.last("__conv", ignorenulls=True).over(w))
        .filter(
            (F.col("__is_probe") == 1)
            & F.col("__next").isNotNull()
            & ((F.col("__next.us") - F.col("us")) <= F.lit(horizon_us))
        )
        .select(
            F.col("__next.eid").alias("conv_id"),
            F.col("__next.cents").alias("cents"),
            F.expr(f"(__next.us - us) div {day_us}").alias("d"),
            "us", "eid", "channel",
        )
        .withColumn(
            "wt", F.expr(f"shiftleft(CAST(1 AS BIGINT), {horizon_days} - d)")
        ),
        checkpoint_mode,
    )
    per_conv = Window.partitionBy("conv_id")
    rem_order = Window.partitionBy("conv_id").orderBy(
        F.abs(F.col("rem")).desc(), F.asc("us"), F.asc("eid")
    )
    credits = (
        assigned.withColumn("W", F.sum("wt").over(per_conv))
        .withColumn("prod", F.col("cents") * F.col("wt"))
        .withColumn("base", F.expr("prod div W"))
        .withColumn("rem", F.col("prod") % F.col("W"))
        .withColumn("R", F.col("cents") - F.sum("base").over(per_conv))
        .withColumn("rn", F.row_number().over(rem_order))
        .select(
            "channel",
            (
                F.col("base")
                + F.when(
                    F.col("rn") <= F.abs("R"),
                    F.signum("R").cast("long"),
                ).otherwise(F.lit(0))
            ).alias("credit"),
        )
    )
    direct = conv.join(
        assigned.select("conv_id").distinct(),
        conv["eid"] == F.col("conv_id"),
        "left_anti",
    ).select(F.lit(-1).alias("channel"), F.col("cents").alias("credit"))
    return (
        credits.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit").alias("credited_cents"),
        )
    )


def sequential_triples(
    events: DataFrame,
    max_gap: int = 1,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Length-3 sequential pattern counts: (a → b → c) where b follows
    a within ``max_gap`` positions and c follows b within ``max_gap``
    — the GSP/PrefixSpan length-3 stage on top of
    ``sequential_pairs``.

    Same plan discipline: a position-range double self-join would be
    unbounded; two stacked ``lead`` fans over ONE window partitioning
    emit every (gap₁, gap₂) successor combination as max_gap² columns
    — constant per row — then one groupBy counts.  Work is
    rows × max_gap², one key shuffle plus the count shuffle, nothing
    quadratic at any skew.

    Output: ``a, b, c, n_triples, n_keys`` (distinct-key support).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    seq = events.filter(
        F.col(ts_col).isNotNull() & F.col(event_col).isNotNull()
    )
    combos = []
    for g1 in range(1, max_gap + 1):
        for g2 in range(1, max_gap + 1):
            combos.append(
                F.struct(
                    F.lead(event_col, g1).over(w).alias("b"),
                    F.lead(event_col, g1 + g2).over(w).alias("c"),
                )
            )
    fanned = seq.select(
        F.col(key_col).alias("__k"),
        F.col(event_col).alias("a"),
        F.array(*combos).alias("__succ"),
    )
    triples = (
        fanned.select("__k", "a", F.explode("__succ").alias("s"))
        .select("__k", "a", F.col("s.b").alias("b"), F.col("s.c").alias("c"))
        .filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    )
    return triples.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("__k").alias("n_keys"),
    )


def churn_labels(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    horizon: int,
    period_col=None,
) -> DataFrame:
    """Leakage-safe churn labels: did the user go quiet for ``horizon``
    after this activity?

    The training-label generator for churn models, built so the label
    can only see the FUTURE relative to its own row — ``churned`` is
    true iff the user's next event is more than ``horizon`` time units
    away (or never comes).  Computing it from the ordered per-user
    event sequence (one ``lead`` window) makes leakage structurally
    impossible: no feature computed at-or-before the row's timestamp
    can overlap the label window.

    ``ts_col`` is an exact integer (epoch µs, day number — caller's
    unit, ``horizon`` matches).  Returns the input keys plus
    ``next_gap`` (NULL when no later event) and ``churned``.

    If ``period_col`` is given (a Column, e.g. a month number), only
    each user's LAST event per period is labeled — the snapshot
    formulation ("active in month M, silent for horizon after their
    last touch") that avoids double-counting heavy users.

    Rows must be unique per (user, ts): with exact-duplicate
    timestamps the lead gap and the per-period last-row pick would be
    ordering-ambiguous — dedupe activity instants upstream.

    Scale: one window over (user, ts) — the same partitioning every
    sessionization pass already uses.
    """
    w = Window.partitionBy("__u").orderBy("__t")
    base = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).cast("long").alias("__t"),
        *([] if period_col is None else [period_col.alias("__p")]),
    ).withColumn("__next", F.lead("__t").over(w))
    if period_col is not None:
        wp = Window.partitionBy("__u", "__p").orderBy(F.desc("__t"))
        base = base.withColumn(
            "__rk", F.row_number().over(wp)
        ).filter(F.col("__rk") == 1)
    out = base.select(
        F.col("__u").alias(user_col),
        F.col("__t").alias(ts_col),
        *([] if period_col is None else [F.col("__p").alias("period")]),
        (F.col("__next") - F.col("__t")).alias("next_gap"),
        (
            F.col("__next").isNull()
            | (F.col("__next") - F.col("__t") > horizon)
        ).alias("churned"),
    )
    return out


def growth_accounting(
    actives: DataFrame, user_col: str, period_col: str
) -> DataFrame:
    """Growth accounting — the new/retained/resurrected/churned user
    ledger (the startup-metrics standard for explaining MAU deltas).

    ``actives``: distinct (user, period) activity rows with integer
    consecutive-unit periods (week number, month number).  Per user,
    one ordered window classifies each active period — ``new`` (first
    ever), ``retained`` (also active the period before), ``resurrected``
    (active after a gap) — and attributes a ``churned`` event to the
    period AFTER the last one of each gap (active at p, absent at
    p+1).  Right-censoring is honest: a user silent after the final
    observed period is not counted churned, since the next period
    hasn't happened.

    The accounting identity ``actives(p) = new + retained +
    resurrected`` holds exactly (pytest-pinned).

    Scale: one (user, period) window — lag/lead on the per-user
    timeline, then a per-period count aggregate.
    """
    w = Window.partitionBy("__u").orderBy("__p")
    base = (
        actives.select(
            F.col(user_col).alias("__u"),
            F.col(period_col).cast("long").alias("__p"),
        )
        .distinct()
        .withColumn("__prev", F.lag("__p").over(w))
        .withColumn("__next", F.lead("__p").over(w))
    )
    states = base.select(
        "__p",
        F.when(F.col("__prev").isNull(), "new")
        .when(F.col("__prev") == F.col("__p") - 1, "retained")
        .otherwise("resurrected")
        .alias("state"),
        # churn event lands in period __p + 1 when the user skips it
        F.when(
            F.col("__next").isNotNull()
            & (F.col("__next") > F.col("__p") + 1),
            F.col("__p") + 1,
        ).alias("churn_period"),
    )
    by_state = states.groupBy(F.col("__p").alias("period")).agg(
        F.sum(F.when(F.col("state") == "new", 1).otherwise(0)).alias(
            "n_new"
        ),
        F.sum(
            F.when(F.col("state") == "retained", 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(F.col("state") == "resurrected", 1).otherwise(0)
        ).alias("n_resurrected"),
    )
    churns = (
        states.filter(F.col("churn_period").isNotNull())
        .groupBy(F.col("churn_period").alias("period"))
        .agg(F.count(F.lit(1)).alias("n_churned_in"))
    )
    return by_state.join(churns, "period", "full").select(
        "period",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
        F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
        F.coalesce("n_churned_in", F.lit(0)).alias("n_churned_in"),
    )


def funnel_with_exclusion(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    step_a: str,
    step_b: str,
    exclude: str,
    horizon: int,
) -> DataFrame:
    """Two-step funnel with an exclusion event — the windowFunnel
    'strict_deduplication'-style mode: a ``step_a`` converts on the
    FIRST ``step_b`` within ``horizon``, but the conversion is VOIDED
    if an ``exclude`` event falls strictly between them (the checkout
    error that invalidates the view→purchase attribution).

    Per step_a row returns ``{user}, a_ts, b_ts, voided, converted``:
    ``converted`` = matched and not voided; unmatched step_a rows keep
    NULL ``b_ts``.  All timestamps integer; first-match tie = smallest
    ``b_ts``.

    Plan: one keyed (user) join A×B with the time band (first match
    via min-aggregate, never a row explosion past the band), then ONE
    keyed anti-join probe of the exclusion set against the matched
    interval — exclusion events are filtered to the type first, so the
    probe side is small.  The horizon bounds the band join exactly
    like the temporal-reach operator.
    """
    a = events.filter(F.col(type_col) == step_a).select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("a_ts")
    )
    b = events.filter(F.col(type_col) == step_b).select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("b_ts")
    )
    matched = (
        a.join(b, "u", "left")
        .filter(
            F.col("b_ts").isNull()
            | (
                (F.col("b_ts") > F.col("a_ts"))
                & (F.col("b_ts") - F.col("a_ts") <= horizon)
            )
        )
        .groupBy("u", "a_ts")
        .agg(F.min("b_ts").alias("b_ts"))
    )
    # a left join b keeps null-b rows only when the user has NO b at
    # all; users with b rows but none in-band lose their a rows to the
    # filter — restore them with an anti-join union
    unmatched = a.join(
        matched.select("u", "a_ts"), ["u", "a_ts"], "left_anti"
    ).withColumn("b_ts", F.lit(None).cast("long"))
    pairs = matched.unionByName(unmatched)
    ex = events.filter(F.col(type_col) == exclude).select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("e_ts")
    )
    voided = (
        pairs.filter(F.col("b_ts").isNotNull())
        .join(ex, "u")
        .filter(
            (F.col("e_ts") > F.col("a_ts"))
            & (F.col("e_ts") < F.col("b_ts"))
        )
        .select("u", "a_ts")
        .distinct()
        .withColumn("__v", F.lit(True))
    )
    return pairs.join(voided, ["u", "a_ts"], "left").select(
        F.col("u").alias(user_col),
        "a_ts",
        "b_ts",
        F.coalesce("__v", F.lit(False)).alias("voided"),
        (
            F.col("b_ts").isNotNull()
            & ~F.coalesce("__v", F.lit(False))
        ).alias("converted"),
    )


def position_attribution(
    events: DataFrame,
    touch_types: list[str],
    conv_type: str,
    horizon_us: int,
    channel: Column,
    first_bp: int = 4000,
    last_bp: int = 4000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution with EXACT
    cent conservation — the 40/20/40 sibling of linear_attribution:
    first touch ``first_bp``/10000 of the value, last touch
    ``last_bp``/10000, middles share the rest equally.

    Conservation by construction, not by rounding hope: the first and
    last buckets are integer-divided from the cents, the MIDDLE bucket
    is defined as the exact leftover (absorbing both divisions'
    truncation), and the middle split reuses the div/first-k-extra
    rule — Σ credited ≡ Σ conversion value for every path length,
    positive or refund-negative.  Degenerate paths: one touch takes
    everything; two touches split 50/50 (there is no middle).

    Same plan as linear_attribution: the shared `_assigned_touches`
    window (one key shuffle), one window pair per conversion id, one
    integer-cents aggregate.

    Output: ``channel, n_credits, credited_cents``.

    ``checkpoint_mode`` — lineage-truncation policy for the shared
    assignment frames (``llmdata.checkpointing``): ``"local"``
    (default) / ``"reliable"`` / ``"none"``.  The default
    ``localCheckpoint`` blocks stay pinned on executors for the
    session; loop-heavy long-lived sessions should pass
    ``"reliable"`` or ``"none"``.
    """
    if not (0 < first_bp and 0 < last_bp and first_bp + last_bp < 10000):
        raise ValueError("first_bp/last_bp must be positive, sum < 10000")
    assigned, conv = _assigned_touches(
        events, touch_types, conv_type, horizon_us, channel,
        key_col, ts_col, id_col, value_col, checkpoint_mode,
    )
    per_conv = Window.partitionBy("conv_id")
    order = Window.partitionBy("conv_id").orderBy("us", "eid")
    a = (
        assigned.withColumn("n", F.count(F.lit(1)).over(per_conv))
        .withColumn("rn", F.row_number().over(order))
        .withColumns(
            {
                "first_c": F.expr(f"(cents * {first_bp}) div 10000"),
                "last_c": F.expr(f"(cents * {last_bp}) div 10000"),
            }
        )
        .withColumn(
            "mid_total", F.col("cents") - F.col("first_c") - F.col("last_c")
        )
    )

    def _extra(rem: Column, pos: Column) -> Column:
        return F.when(
            pos <= F.abs(rem),
            F.when(rem > 0, F.lit(1)).when(rem < 0, F.lit(-1)).otherwise(
                F.lit(0)
            ),
        ).otherwise(F.lit(0))

    two_rem = F.col("cents") % F.lit(2)
    mid_rem = F.expr("mid_total % (n - 2)")
    credit = (
        F.when(F.col("n") == 1, F.col("cents"))
        .when(
            F.col("n") == 2,
            F.expr("cents div 2") + _extra(two_rem, F.col("rn")).cast("long"),
        )
        .otherwise(
            F.when(F.col("rn") == 1, F.col("first_c"))
            .when(F.col("rn") == F.col("n"), F.col("last_c"))
            .otherwise(
                F.expr("mid_total div (n - 2)")
                + _extra(mid_rem, F.col("rn") - 1).cast("long")
            )
        )
    )
    credits = a.select("channel", credit.alias("credit"))
    direct = (
        conv.join(
            assigned.select("conv_id").distinct(),
            conv["eid"] == F.col("conv_id"),
            "left_anti",
        )
        .select(F.lit(-1).alias("channel"), F.col("cents").alias("credit"))
    )
    return (
        credits.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit").alias("credited_cents"),
        )
    )


def markov_attribution(
    events: DataFrame,
    touch_types: list[str],
    conv_type: str,
    channel: Column,
    n_channels: int,
    rounds: int = 80,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Markov-chain (removal-effect) attribution — the data-driven
    member of the attribution family (Anderl et al. 2014): model each
    user's pre-conversion touch sequence as a first-order chain
    START → channels → CONV/NULL, and credit channel c by how much
    the chain's conversion probability DROPS when every transition
    into c is redirected to NULL.

    Exactness: the absorption probability is iterated ``rounds``
    times in INTEGER NANO-UNITS — each update is
    ``v'_i = (Σ_j cnt[i][j]·v[j]) div tot_i`` over exact transition
    counts, so every round is pure integer arithmetic, bit-identical
    on any engine (geometric convergence puts the default 80 rounds far
    below the nano grid for any chain whose absorbing mass per step
    is ≥ ~1/3;
    the floor per round is part of the defined arithmetic, mirrored
    by the oracle).  Magnitude contract (the t_closeness/loo_influence
    rule): each per-round partial sum is bounded by ``tot_i · 1e9``,
    so no single state may emit more than ~9.2e9 transitions (2^63 /
    1e9).  Beyond that, pre-aggregate journeys (sample users or
    bucket counts — only the count RATIOS enter the chain, so any
    common per-row divisor preserves the result).

    Scale shape: the DATA-scale work is the journey extraction (one
    per-user window pass + one (from,to) groupBy — the transition_
    matrix plan); the chain itself is a BOUNDED (n_channels+3)² count
    matrix collapsed to one row, and the removal×rounds×states
    iteration runs as nested array folds ON that row — constant-size
    expression tree (the q357 parameters-as-data discipline), no
    driver loop, no per-round joins.

    States: 0..n_channels−1 = channels, m = START, m+1 = CONV,
    m+2 = NULL.  A user's journey is their qualifying touches
    strictly before their first conversion (all touches if they never
    convert); converted users with zero touches contribute
    START→CONV.

    Output: one row per variant — ``removed`` (−1 = full chain,
    else the removed channel), ``p_conv_nano``, ``base_nano``,
    ``effect_nano`` (base − removed, ≥ 0 up to nano flooring) and
    ``share`` (effect / Σ effects, one IEEE division).

    ``checkpoint_mode`` — lineage-truncation policy for the sequenced
    journey frame (it feeds all four transition branches), per
    ``llmdata.checkpointing``: ``"local"`` (default) / ``"reliable"``
    / ``"none"``.  Retention note: the default ``localCheckpoint``
    blocks stay pinned on executors for the session once the plan
    executes — a long-lived session calling this in a loop should
    pass ``"reliable"`` (checkpoint-dir storage, cleanable) or
    ``"none"`` (pure lazy plan, re-derivation cost).
    """
    m = n_channels
    start_s, conv_s, null_s = m, m + 1, m + 2
    S = m + 3
    e = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(id_col).alias("eid"),
        "event_type",
        channel.cast("int").alias("ch"),
    )
    conv1 = (
        e.filter(F.col("event_type") == conv_type)
        .groupBy("k")
        .agg(F.min("us").alias("p_us"))
    )
    touches = (
        e.filter(F.col("event_type").isin(*touch_types))
        .join(conv1, "k", "left")
        .filter(F.col("p_us").isNull() | (F.col("us") < F.col("p_us")))
    )
    w = Window.partitionBy("k").orderBy("us", "eid")
    # materialize the sequenced journeys: all four transition branches
    # (first-touch, interior, last-touch, zero-touch-converter) read
    # this frame, and Spark re-embeds the events scan + conversion
    # join + window pass at every reference — the r11 baseline plan
    # re-scanned the events parquet 9× and ran the per-user window 4×
    # for one call (optimization guide §2.4)
    from db_factfinder_spark.llmdata.checkpointing import materialize

    seq = materialize(
        touches.withColumns(
            {
                "rn": F.row_number().over(w),
                "nxt": F.lead("ch").over(w),
            }
        ),
        checkpoint_mode,
    )
    end_state = F.when(
        F.col("p_us").isNotNull(), F.lit(conv_s)
    ).otherwise(F.lit(null_s))
    trans = (
        seq.filter(F.col("rn") == 1)
        .select(F.lit(start_s).alias("fi"), F.col("ch").alias("ti"))
        .unionByName(
            seq.filter(F.col("nxt").isNotNull()).select(
                F.col("ch").alias("fi"), F.col("nxt").alias("ti")
            )
        )
        .unionByName(
            seq.filter(F.col("nxt").isNull()).select(
                F.col("ch").alias("fi"), end_state.alias("ti")
            )
        )
        .unionByName(
            # seq has exactly touches' rows (withColumns adds columns
            # only), so the distinct-keys anti-join reads the
            # materialized frame instead of re-embedding the scan+join
            conv1.join(
                seq.select("k").distinct(), "k", "left_anti"
            ).select(
                F.lit(start_s).alias("fi"), F.lit(conv_s).alias("ti")
            )
        )
    )
    cnt = trans.groupBy("fi", "ti").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    one = cnt.agg(
        F.collect_list(F.struct("fi", "ti", "c")).alias("ent")
    )

    # ---- single-row bounded-chain program (nested array folds) ----
    def with_ent(ent: Column) -> Column:
        # dense S×S count matrix from the sparse entries
        mat = F.transform(
            F.sequence(F.lit(0), F.lit(S - 1)),
            lambda i: F.transform(
                F.sequence(F.lit(0), F.lit(S - 1)),
                lambda j: F.aggregate(
                    ent,
                    F.lit(0).cast("long"),
                    lambda acc, x: acc
                    + F.when((x["fi"] == i) & (x["ti"] == j), x["c"])
                    .otherwise(F.lit(0)),
                ),
            ),
        )

        def with_mat(M: Column) -> Column:
            removals = F.array(
                F.lit(-1), *[F.lit(c) for c in range(m)]
            )

            def p_conv(r: Column) -> Column:
                # removal r: transitions into r go to NULL instead
                Mr = F.transform(
                    M,
                    lambda row: F.transform(
                        F.sequence(F.lit(0), F.lit(S - 1)),
                        lambda j: F.when(
                            j == F.lit(null_s),
                            F.element_at(row, null_s + 1)
                            + F.when(
                                r >= 0,
                                F.element_at(row, r + 1),
                            ).otherwise(F.lit(0)),
                        )
                        .when(j == r, F.lit(0).cast("long"))
                        .otherwise(F.element_at(row, j + 1)),
                    ),
                )

                def with_mr(MR: Column) -> Column:
                    tot = F.transform(
                        MR,
                        lambda row: F.aggregate(
                            row,
                            F.lit(0).cast("long"),
                            lambda acc, x: acc + x,
                        ),
                    )

                    def with_tot(T: Column) -> Column:
                        v0 = F.transform(
                            F.sequence(F.lit(0), F.lit(S - 1)),
                            lambda i: F.when(
                                i == F.lit(conv_s),
                                F.lit(1_000_000_000).cast("long"),
                            ).otherwise(F.lit(0).cast("long")),
                        )
                        vK = F.aggregate(
                            F.sequence(F.lit(1), F.lit(rounds)),
                            v0,
                            lambda v, _: F.transform(
                                F.sequence(F.lit(0), F.lit(S - 1)),
                                lambda i: F.when(
                                    i == F.lit(conv_s),
                                    F.lit(1_000_000_000).cast("long"),
                                )
                                .when(
                                    F.element_at(T, i + 1) == 0,
                                    F.lit(0).cast("long"),
                                )
                                .otherwise(
                                    F.floor(
                                        F.aggregate(
                                            F.sequence(
                                                F.lit(0), F.lit(S - 1)
                                            ),
                                            F.lit(0).cast("long"),
                                            lambda acc, j: acc
                                            + F.element_at(
                                                F.element_at(MR, i + 1),
                                                j + 1,
                                            )
                                            * F.element_at(v, j + 1),
                                        )
                                        / F.element_at(T, i + 1)
                                    ).cast("long")
                                ),
                            ),
                        )
                        return F.element_at(vK, start_s + 1)

                    return let(tot, with_tot)

                return let(Mr, with_mr)

            return F.transform(removals, p_conv)

        return let(mat, with_mat)

    from db_factfinder_spark.functions.expr import let

    probs = one.select(let(F.col("ent"), with_ent).alias("p"))
    base = F.element_at(F.col("p"), 1)
    effects = F.transform(
        F.slice(F.col("p"), 2, m), lambda x: base - x
    )
    exploded = probs.select(
        base.alias("base_nano"),
        F.aggregate(
            effects, F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_eff"),
        F.posexplode(
            F.concat(F.array(base), F.slice(F.col("p"), 2, m))
        ).alias("pos", "p_conv_nano"),
    )
    return exploded.select(
        (F.col("pos") - 1).alias("removed"),
        "p_conv_nano",
        "base_nano",
        F.when(
            F.col("pos") > 0, F.col("base_nano") - F.col("p_conv_nano")
        ).alias("effect_nano"),
        F.when(
            (F.col("pos") > 0) & (F.col("sum_eff") > 0),
            (F.col("base_nano") - F.col("p_conv_nano")).cast("double")
            / F.col("sum_eff").cast("double"),
        ).alias("share"),
    )
