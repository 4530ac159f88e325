"""Data-quality audit operators: constraint validation and column
profiling.

The checks a warehouse load runs before publishing a table — foreign-
key orphans, null rates, cardinalities — expressed as single-pass
Spark plans.  At 100 TB the shapes that matter: FK validation is a
LEFT ANTI join (broadcast when the parent's key set fits, which a
dimension's always does); profiling is ONE aggregate over the scan
(count/null-count per column are plain conditional counts; distinct
counts share the pass via Expand), never one job per column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
) -> DataFrame:
    """Rows of ``child`` whose ``fk`` has no match in ``parent.pk``
    (NULL fks are orphans too — a NULL never satisfies the
    constraint).  LEFT ANTI join; broadcast the parent key set."""
    keys = F.broadcast(parent.select(F.col(pk).alias(fk)).distinct())
    return child.join(keys, [fk], "left_anti")


def profile_columns(
    df: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """One-pass profile: per requested column a row of
    ``(col_name, n_rows, n_null, n_distinct)`` — the publish-gate
    sanity report.  All counts come from ONE aggregate (distincts
    share the pass through Catalyst's Expand rewrite); the long
    single-row result unpivots to one row per column map-side."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"dist_{c}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"null_{c}").alias("n_null"),
                F.col(f"dist_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def observed(df, name: str, metrics: dict[str, Column]):
    """Attach Spark's native observation metrics to a frame: the named
    aggregates are computed ON THE SAME PASS as whatever action runs
    the frame (CollectMetricsExec — no second scan, unlike running a
    separate audit agg), and read back from the returned
    ``Observation`` after the action.

    This is how a 100 TB pipeline gets row counts / null rates /
    checksum totals for free while writing its output: profiling with
    ``profile_columns`` costs an extra scan; ``observed`` costs
    nothing.  Metrics must be aggregates Spark allows in observations
    (no distinct); returns ``(df, observation)``."""
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
    return out, obs


def benford_digit_test(
    df, value_col: str, scale: int = 100
) -> "DataFrame":
    """Benford's-law first-digit audit — the forensic data-quality
    screen for fabricated or truncated numeric columns (Benford 1938;
    widely used in fraud auditing): observed leading-digit counts of
    the positive values against expected p_d = log10(1 + 1/d), plus
    the χ² distance.

    The nine expected probabilities enter the plan as HARDCODED
    decimal literals — the same nine doubles the SQL oracle hardcodes
    — so both engines parse identical text and no runtime log10 (whose
    last bit is the host libm's) can ever enter the comparison.
    Counts are exact integers; each digit's (O−E)²/E is a fixed IEEE
    chain; the cross-digit sum is 1e-9 fixed-point (order-free).
    ``scale`` integerizes the value first (cents by default) so the
    leading digit comes from exact arithmetic, not float formatting.

    One count shuffle on 9 keys.  Output: per-digit rows
    ``digit, n_obs, p_expected, n_expected, cell_chi2`` + table-level
    ``chi2, n`` on every row.
    """
    from pyspark.sql import functions as F

    # log10(1 + 1/d) for d = 1..9, frozen as literals (not recomputed
    # via math.log10 at call time — a platform libm rounding any value
    # differently from these would silently break oracle parity).
    p = {
        1: 0.3010299956639812,
        2: 0.17609125905568124,
        3: 0.12493873660829992,
        4: 0.09691001300805642,
        5: 0.07918124604762482,
        6: 0.06694678963061322,
        7: 0.05799194697768673,
        8: 0.05115252244738129,
        9: 0.04575749056067514,
    }
    v = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    counts = (
        df.filter(v > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    # complete 1..9 (a digit can be absent; its E still contributes)
    digits = counts.sparkSession.createDataFrame(
        [(d, p[d]) for d in range(1, 10)], "digit int, p_expected double"
    )
    full = digits.join(counts, "digit", "left").select(
        "digit",
        "p_expected",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
    )
    tot = full.agg(F.sum("n_obs").alias("n"))
    j = full.crossJoin(F.broadcast(tot))
    e = F.col("p_expected") * F.col("n").cast("double")
    o = F.col("n_obs").cast("double")
    cell = (o - e) * (o - e) / e
    withq = j.withColumn("n_expected", e).withColumn(
        "cell_chi2", cell
    ).withColumn(
        "__q", F.floor(cell * F.lit(1000000000.0) + F.lit(0.5)).cast("long")
    )
    total = withq.agg(
        (F.sum("__q").cast("double") / F.lit(1000000000.0)).alias("chi2"),
        F.max("n").alias("n"),
    )
    return (
        withq.select("digit", "n_obs", "p_expected", "n_expected", "cell_chi2")
        .crossJoin(F.broadcast(total))
    )


def vocabulary_drift_test(
    df: DataFrame,
    text_col: str = "text",
    domain_col: str = "source",
    top_v: int = 30,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Per-domain vocabulary drift audit: Pearson χ² over the
    (domain × top-V corpus token) contingency table of token
    OCCURRENCES — the crawl-monitoring screen that flags a source
    whose language suddenly shifts (template change, spam flood,
    encoding breakage) before it pollutes a training mix.

    The vocabulary is the corpus's ``top_v`` most frequent tokens with
    a deterministic tie-break (count desc, token asc — both engines
    rank identically), restricting the table to a BOUNDED column set
    so the complete-grid crossJoin stays domains × top_v however big
    the corpus is.  The χ² arithmetic (exact marginals, fixed IEEE
    cell chain, 1e-9 fixed-point order-free cross-cell sum) is
    delegated to ``chi_square_independence`` — one audited exactness
    contract, two operators.

    Plan: explode → token counts (one shuffle) → top-V via one
    TakeOrdered-sized window → broadcast semi-join restricts the
    occurrence stream map-side → χ²'s single (domain, token) count
    shuffle.  Linear in corpus tokens.

    Output (from chi_square_independence): ``a`` = domain, ``b`` =
    token, ``n_obs, n_exp, cell_chi2`` per cell + table ``chi2, dof,
    n`` on every row.
    """
    from pyspark.sql import Window

    from db_factfinder_spark.llmdata.textstats import tokens
    from db_factfinder_spark.operators.regression import (
        chi_square_independence,
    )

    occ = df.select(
        F.col(domain_col).alias("__dom"), F.explode(tokens(text_col)).alias("__t")
    )
    w = Window.orderBy(F.desc("c"), F.asc("__t"))
    vocab = (
        occ.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= top_v)
        .select("__t")
    )
    restricted = occ.join(F.broadcast(vocab), "__t")
    return chi_square_independence(
        restricted, "__dom", "__t", checkpoint_mode=checkpoint_mode
    )


def sequence_gaps(df: DataFrame, id_col: str) -> DataFrame:
    """Missing ranges in an integer id sequence — the completeness
    audit for ingest pipelines ("which order ids never arrived?").

    The textbook lead-window formulation sorts the ENTIRE id set in
    one partition — a driver-killer at 100 TB.  This operator keeps
    the heavy work embarrassingly parallel: a gap STARTS at id+1
    wherever id exists but id+1 doesn't (hash anti-join), and ENDS at
    id−1 wherever id exists but id−1 doesn't (second anti-join); the
    k-th smallest start pairs with the k-th smallest end.  Only the
    boundary rows — |gaps|, usually orders of magnitude smaller than
    |ids| — pass through the single-partition pairing window, and the
    min/max guards are one-row scalar broadcasts.

    Output: ``gap_start, gap_end, missing`` (counts exact).
    """
    ids = (
        df.select(F.col(id_col).cast("long").alias("i"))
        .filter(F.col("i").isNotNull())  # NULL ids are absent, not gaps
        .distinct()
    )
    bounds = ids.agg(
        F.min("i").alias("lo"), F.max("i").alias("hi")
    )
    # starts: ids i where i+1 missing → gap starts at i+1 (unless i=hi)
    starts = (
        ids.join(ids.withColumnRenamed("i", "j"),
                 F.col("i") + 1 == F.col("j"), "left_anti")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("i") < F.col("hi"))
        .select((F.col("i") + 1).alias("gap_start"))
    )
    # ends: ids i where i-1 missing → previous gap ended at i-1
    ends = (
        ids.join(ids.withColumnRenamed("i", "j"),
                 F.col("i") - 1 == F.col("j"), "left_anti")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("i") > F.col("lo"))
        .select((F.col("i") - 1).alias("gap_end"))
    )
    from pyspark.sql import Window

    ws = Window.orderBy("gap_start")
    we = Window.orderBy("gap_end")
    s = starts.withColumn("k", F.row_number().over(ws))
    e = ends.withColumn("k", F.row_number().over(we))
    return s.join(e, "k").select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("missing"),
    )


def log2_histogram(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Power-of-two (log-width) histogram per group — the HDR-style
    bucketing latency/value metrics use, where equi-width bins (q123)
    waste resolution at the head and clip the tail.

    The bucket is the EXACT integer ⌊log2(x)⌋+1, computed with no
    libm: the length of the value's binary-string representation
    (``length(bin(x))``) — identical in any engine, no float rounding
    to disagree over.  Bucket bounds come back via integer shifts.
    Requires positive integral values (NULL/≤0 rows are dropped and
    counted in the caller's completeness audit, not silently binned).

    One partial-aggregated groupBy; output is O(groups × 64).

    Output: ``<group_cols>, bucket, lo, hi, n, min_v, max_v``.
    """
    v = F.col(value_col)
    b = F.length(F.bin(v)).alias("bucket")
    return (
        df.filter(v.isNotNull() & (v > 0))
        .select(*group_cols, v.alias("__v"), b)
        .groupBy(*group_cols, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__v").alias("min_v"),
            F.max("__v").alias("max_v"),
        )
        .select(
            *group_cols,
            "bucket",
            # SQL-form shifts: the Python shiftleft only takes int
            # literals for the bit count
            F.expr("shiftleft(1L, bucket - 1)").alias("lo"),
            F.expr("shiftleft(1L, bucket) - 1L").alias("hi"),
            "n",
            "min_v",
            "max_v",
        )
    )


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's κ inter-rater agreement between two categorical
    columns — observed agreement corrected for the agreement two
    raters with these marginals would reach by chance (Cohen, 1960).
    The evaluation statistic for "does the cheap classifier agree
    with the gold label beyond luck".

    Evaluated entirely in cross-multiplied exact integers:

        κ = (N·Σ_k diag_k − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k)

    one IEEE division; NULL (undefined) when the chance term equals
    N² (a degenerate marginal).  Rows with a NULL on either side are
    excluded.

    Plan: one (a, b) contingency groupBy, marginals as two further
    tiny aggregates of it, scalars combined via one-row broadcast
    crossJoins — the fact table is read once.

    Output: one row — ``n, n_agree, pe_num, kappa``.
    """
    v = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
    cells = v.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    tot = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    ra = cells.groupBy("a").agg(F.sum("c").alias("__r"))
    cb = cells.groupBy("b").agg(F.sum("c").alias("__c"))
    pe = (
        ra.join(cb, ra["a"] == cb["b"])
        .agg(F.coalesce(F.sum(F.col("__r") * F.col("__c")), F.lit(0))
             .cast("long").alias("pe_num"))
    )
    return tot.crossJoin(F.broadcast(pe)).select(
        "n",
        "n_agree",
        "pe_num",
        F.when(
            F.col("n") * F.col("n") - F.col("pe_num") != 0,
            (F.col("n") * F.col("n_agree") - F.col("pe_num")).cast("double")
            / (F.col("n") * F.col("n") - F.col("pe_num")).cast("double"),
        ).alias("kappa"),
    )


def total_variation(
    df: DataFrame,
    seg_col: str,
    bucket_col: str,
    seg_a,
    seg_b,
) -> DataFrame:
    """Total-variation distance between two segments' bucket
    distributions — the distribution-drift metric that needs NO
    logarithm (PSI/KL do, and libm logs are not bit-portable):
    TVD = ½·Σ_b |p_b − q_b|, here in cross-multiplied exact integers

        TVD = Σ_b |c¹_b·N² − c²_b·N¹| / (2·N¹·N²)

    so every intermediate is a long and the single division is the
    only rounding.  TVD is the drift alarm's workhorse: 0 = identical
    distributions, 1 = disjoint support.

    Plan: one (segment, bucket) count shuffle filtered to the two
    segments, a bucket-grain full outer self-merge (zero-filled), two
    scalar totals broadcast, one final aggregate.

    Output: one row — ``n_a, n_b, n_buckets, tvd`` (NULL when either
    segment is empty).
    """
    counts = (
        df.filter(F.col(seg_col).isin([seg_a, seg_b]))
        .groupBy(seg_col, bucket_col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = counts.filter(F.col(seg_col) == seg_a).select(
        F.col(bucket_col).alias("b"), F.col("c").alias("ca")
    )
    b = counts.filter(F.col(seg_col) == seg_b).select(
        F.col(bucket_col).alias("b"), F.col("c").alias("cb")
    )
    merged = a.join(b, "b", "full_outer").select(
        "b",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = merged.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    j = merged.crossJoin(F.broadcast(tot))
    return j.agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.when(
            (F.first("n_a") > 0) & (F.first("n_b") > 0),
            F.sum(
                F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
            ).cast("double")
            / (2 * F.first("n_a") * F.first("n_b")).cast("double"),
        ).alias("tvd"),
    )


def count_of_counts(
    df: DataFrame,
    item_col: str,
) -> DataFrame:
    """Frequency-of-frequencies profile n_k = #items occurring exactly
    k times, plus the Good–Turing readouts LM smoothing and
    catalog-tail analysis both need: the discounted count
    c*(k) = (k+1)·n_{k+1}/n_k and the unseen-mass share n_1/N.

    Two keyed aggregations (item counts → count histogram); the
    n_{k+1} lookup is a (k+1) calendar-style equi-join on the TINY
    histogram — no unpartitioned window anywhere.  Every statistic
    until the final two divisions is an exact integer; the divisions
    are single fixed-order IEEE ops, so the profile is
    engine-reproducible.  c* is NULL where n_{k+1} = 0 (the classic
    GT estimator is undefined there — smoothing variants interpolate;
    emitting NULL keeps the operator honest).

    Output: ``k, n_k, gt_cstar, p_unseen`` (p_unseen repeated per
    row: n_1/N with N = total occurrences).
    """
    item_counts = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("k"))
    )
    hist = item_counts.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_k")
    )
    nxt = hist.select(
        (F.col("k") - 1).alias("k"), F.col("n_k").alias("__n_k1")
    )
    totals = item_counts.agg(
        F.sum("k").alias("__N"),
    )
    n1 = hist.filter(F.col("k") == 1).agg(
        F.sum("n_k").alias("__n1")
    )
    return (
        hist.join(nxt, "k", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n1))
        .select(
            "k",
            "n_k",
            (
                (F.col("k") + 1).cast("double")
                * F.col("__n_k1").cast("double")
                / F.col("n_k").cast("double")
            ).alias("gt_cstar"),
            (
                F.coalesce(F.col("__n1"), F.lit(0)).cast("double")
                / F.col("__N").cast("double")
            ).alias("p_unseen"),
        )
    )


def fd_violations(
    df: DataFrame,
    lhs_cols: list[str],
    rhs_col: str,
    fd_name: str | None = None,
) -> DataFrame:
    """Functional-dependency check ``lhs → rhs`` for data profiling.

    The candidate-FD validation step of discovery tools (Metanome/TANE
    family): an FD holds iff no LHS group sees more than one distinct
    RHS value.  One row out: ``fd, n_groups, n_violating, n_rows,
    max_rhs_distinct`` — the violation census, not just a boolean, so
    a 99.9%-held "soft" FD is distinguishable from a dead one.

    Two hash aggregations, both map-side-combinable: distinct (lhs,
    rhs) pairs, then per-lhs distinct-rhs counts.  NULL RHS counts as
    a value (two groups differing only in NULL-ness violate) — the
    strict FD semantics; filter upstream for the lenient reading.
    """
    name = fd_name or (",".join(lhs_cols) + "->" + rhs_col)
    pairs = df.select(*lhs_cols, rhs_col).distinct()
    per_lhs = pairs.groupBy(*lhs_cols).agg(
        F.count(F.lit(1)).alias("n_rhs")
    )
    return per_lhs.agg(
        F.lit(name).alias("fd"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).alias(
            "n_violating"
        ),
        F.max("n_rhs").alias("max_rhs_distinct"),
    )


def missing_partitions(
    df: DataFrame,
    key_col: str,
    period_col: str,
    period_start: int,
    period_end: int,
) -> DataFrame:
    """Backfill planner: which (key, period) cells are MISSING from a
    table that should cover every key × every period in the range?

    The data-completeness audit behind every "why is Tuesday empty for
    tenant X" incident: the expected grid is each observed key crossed
    with the literal period range (``sequence`` — generated, not
    scanned), present cells anti-join away, and what remains is the
    backfill work list, summarized per key so a million-cell gap
    doesn't explode the report.

    Returns ``{key_col}, n_expected, n_present, n_missing,
    first_missing, last_missing``.

    Scale: the grid is |keys| × |periods| rows from a map-side
    explode; the anti-join is one keyed shuffle.  Period ranges are
    bounded by calendars (days, months) — the key set carries the
    scale, and it is never collected.
    """
    keys = df.select(F.col(key_col).alias("__k")).distinct()
    grid = keys.select(
        "__k",
        F.explode(
            F.sequence(F.lit(period_start), F.lit(period_end))
        ).alias("__p"),
    )
    present = df.select(
        F.col(key_col).alias("__k"),
        F.col(period_col).cast("long").alias("__p"),
    ).distinct()
    missing = grid.join(present, ["__k", "__p"], "left_anti")
    per_key = missing.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n_missing"),
        F.min("__p").alias("first_missing"),
        F.max("__p").alias("last_missing"),
    )
    n_expected = period_end - period_start + 1
    return (
        keys.join(per_key, "__k", "left")
        .select(
            F.col("__k").alias(key_col),
            F.lit(n_expected).alias("n_expected"),
            (
                F.lit(n_expected) - F.coalesce("n_missing", F.lit(0))
            ).alias("n_present"),
            F.coalesce("n_missing", F.lit(0)).alias("n_missing"),
            "first_missing",
            "last_missing",
        )
    )


def psi_drift(
    df: DataFrame,
    bucket_col: str,
    snapshot_col: str,
    quantize: int = 1_000_000_000_000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Population Stability Index between snapshot 0 (reference) and
    snapshot 1 (current) of ``snapshot_col``, over ``bucket_col``
    bins — the model-monitoring drift score (rule of thumb: < 0.1
    stable, > 0.25 shifted):

      PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)

    with add-one smoothing so empty buckets stay finite.  Exactness:
    the log is ``ln(c₁+1) + ln(N₂+B) − ln(c₂+1) − ln(N₁+B)`` on
    integers via ``portable_ln`` (bit-exact cross-engine, no product
    overflow), each bucket's contribution is computed in doubles with
    mirrored op order and then QUANTIZED to integer units — the
    per-bucket SUM is therefore order-independent (a raw double sum
    would depend on partitioning).  Report ``psi_units / quantize``.

    One (bucket, snapshot) count + a totals broadcast/join + one
    integer sum.  ``group_cols`` scopes the index per group (one PSI
    row per group — the per-feature/per-slice monitoring layout);
    ``None`` gives the single-row corpus PSI.  Returns
    ``*group_cols, n_buckets, psi_units, psi``.
    """
    keys = list(group_cols or [])
    per = df.groupBy(*keys, bucket_col).agg(
        F.sum(
            F.when(F.col(snapshot_col).cast("int") == 0, 1).otherwise(0)
        ).alias("c1"),
        F.sum(
            F.when(F.col(snapshot_col).cast("int") == 1, 1).otherwise(0)
        ).alias("c2"),
    )
    return psi_from_counts(per, group_cols=keys, quantize=quantize)


def psi_from_counts(
    per: DataFrame,
    group_cols: list[str] | None = None,
    quantize: int = 1_000_000_000_000,
) -> DataFrame:
    """PSI from a PRE-AGGREGATED per-bucket count frame
    ``(*group_cols, <bucket>, c1, c2)`` — the evaluator half of
    :func:`psi_drift`, split out so a Structured Streaming job can
    maintain the counts store incrementally and this batch post-pass
    scores it (the state-maintainer/evaluator split of q299).
    Same smoothing/quantization contract as ``psi_drift``."""
    from db_factfinder_spark.functions.portable_math import portable_ln

    keys = list(group_cols or [])
    # totals as windows over the COUNTS frame (bounded: groups x
    # buckets) — no self-join, which both saves a shuffle and avoids
    # the conflicting-attribute trap when ``per`` is a streaming
    # memory-sink view (self-joins on those fail analysis)
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    j = (
        per.withColumn("n1", F.sum("c1").over(w))
        .withColumn("n2", F.sum("c2").over(w))
        .withColumn("nb", F.count(F.lit(1)).over(w))
    )
    p = (F.col("c1") + 1).cast("double") / (
        F.col("n1") + F.col("nb")
    ).cast("double")
    q = (F.col("c2") + 1).cast("double") / (
        F.col("n2") + F.col("nb")
    ).cast("double")
    lnratio = (
        portable_ln(F.col("c1") + 1)
        + portable_ln(F.col("n2") + F.col("nb"))
    ) - (
        portable_ln(F.col("c2") + 1)
        + portable_ln(F.col("n1") + F.col("nb"))
    )
    unit = F.floor((p - q) * lnratio * F.lit(float(quantize)) + 0.5).cast(
        "long"
    )
    return (
        j.select(*keys, unit.alias("u"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("u").alias("psi_units"),
        )
        .select(
            *keys,
            F.col("n_buckets").cast("long").alias("n_buckets"),
            "psi_units",
            (F.col("psi_units").cast("double") / F.lit(float(quantize))).alias(
                "psi"
            ),
        )
    )
