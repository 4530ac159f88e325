"""Interval algebra: merging overlapping intervals per key.

"Total time covered by (possibly overlapping) windows" is the classic
gaps-and-islands sweep: sort a key's intervals by start, carry the
running maximum end, and open a new island whenever a start clears
everything seen so far.  One window sort per key + one roll-up — the
naive alternative (interval × interval overlap join) is quadratic
inside hot keys and O(n²) on a single giant key.

All arithmetic is on integer bounds, so results are exact and the
sweep is deterministic given a total order (pass a tiebreak column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    by: str,
    s_col: str = "s",
    e_col: str = "e",
    tiebreak: str | None = None,
) -> DataFrame:
    """Merge each key's overlapping/touching [s, e) intervals into
    disjoint islands.  Returns ``by, island, s, e, n_intervals``."""
    order = [F.col(s_col), F.col(e_col)]
    if tiebreak:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(by).orderBy(*order)
    prev_max_e = F.max(e_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_e.isNull() | (F.col(s_col) > prev_max_e), F.lit(1)
    ).otherwise(F.lit(0))
    islands = df.withColumn(
        "__island",
        F.sum(new_island).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return islands.groupBy(by, "__island").agg(
        F.min(s_col).alias(s_col),
        F.max(e_col).alias(e_col),
        F.count(F.lit(1)).alias("n_intervals"),
    ).withColumnRenamed("__island", "island")


def covered_time(
    df: DataFrame,
    by: str,
    s_col: str = "s",
    e_col: str = "e",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per key: total length covered by the union of its intervals and
    the number of disjoint islands — exact integer sums."""
    m = merge_intervals(df, by, s_col, e_col, tiebreak)
    return m.groupBy(by).agg(
        F.sum(F.col(e_col) - F.col(s_col)).alias("covered"),
        F.count(F.lit(1)).alias("n_islands"),
    )


def peak_concurrency(
    df: DataFrame,
    by: str,
    s_col: str = "s",
    e_col: str = "e",
) -> DataFrame:
    """Per key: the maximum number of simultaneously-open [s, e)
    intervals and the earliest instant it is reached.  Returns
    ``by, peak, at``.

    The sweep-line formulation: each interval contributes a +1 event
    at its start and a -1 event at its end; concurrency at any instant
    is the running sum of events ordered by ``(time, delta)``.  Delta
    -1 sorts before +1 at equal times, which IS the half-open
    semantics — an interval ending at t and one starting at t never
    overlap.  The peak is always attained on a +1 row (a -1 row only
    ever lowers the sum), so the per-key answer is one max over the
    start rows' running sums; the earliest attaining instant rides
    along in the same aggregate via max(struct(c, -t)) — single window
    pass + single aggregation, both partitioned by the key, vs the
    quadratic interval x interval overlap join (which the q260 oracle
    deliberately IS, as the independent check).

    Bounds are timestamps (integer bounds are interpreted as epoch
    seconds via the cast); ``at`` is always returned as a timestamp,
    carried through its exact micro-epoch integer.
    """
    starts = df.select(
        F.col(by).alias("__k"),
        F.col(s_col).alias("__t"),
        F.lit(1).alias("__d"),
    )
    ends = df.select(
        F.col(by).alias("__k"),
        F.col(e_col).alias("__t"),
        F.lit(-1).alias("__d"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = (
        starts.unionAll(ends)
        .withColumn("__c", F.sum("__d").over(w))
        .filter(F.col("__d") == 1)
    )
    # Earliest peak instant in the same aggregate: maximize (c, -t_us).
    best = F.max(
        F.struct(
            F.col("__c").alias("c"),
            (-F.unix_micros(F.col("__t").cast("timestamp"))).alias("negt"),
        )
    )
    return (
        run.groupBy("__k")
        .agg(best.alias("__best"))
        .select(
            F.col("__k").alias(by),
            F.col("__best.c").alias("peak"),
            F.timestamp_micros(-F.col("__best.negt")).alias("at"),
        )
    )


def interval_gaps(
    df: DataFrame,
    by: str,
    s_col: str = "s",
    e_col: str = "e",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per key: the uncovered stretches BETWEEN a key's coverage
    islands (downtime / SLA-gap report).  Returns one row per gap:
    ``by, gap_start, gap_end, gap_len`` — exact integer bounds.

    Composes merge_intervals (one window sort per key) with a lag over
    the disjoint islands: a key with k islands yields k-1 gaps; fully
    covered keys yield none.  The island frame is tiny relative to the
    input (bounded by the interval count), so the second window pass
    costs nothing at scale.
    """
    m = merge_intervals(df, by, s_col, e_col, tiebreak)
    w = Window.partitionBy(by).orderBy(F.col(s_col))
    prev_e = F.lag(F.col(e_col)).over(w)
    return (
        m.select(
            F.col(by),
            prev_e.alias("gap_start"),
            F.col(s_col).alias("gap_end"),
        )
        .filter(F.col("gap_start").isNotNull())
        .withColumn("gap_len", F.col("gap_end") - F.col("gap_start"))
    )
