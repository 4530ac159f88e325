"""Range (point-in-interval) join via bucketed equi-join.

Spark plans an inequality-only join as a broadcast nested loop (or a
per-key sort-merge that still scans O(points × intervals) per key).
The scalable form buckets time into fixed-width cells: every interval
explodes to the buckets it covers, every point carries its single
bucket, and the join becomes an *equi*-join on (key, bucket) with the
exact BETWEEN as a cheap post-filter.  Intermediate size is
``points + Σ interval_spans`` instead of a pairwise product, and a pair
can only meet in the point's one bucket — no dedup step needed.

Pick ``bucket_width`` near the typical interval length: each interval
then explodes to ~2 buckets, and a bucket pairs a point only with the
intervals that could plausibly contain it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    by: str,
    t_col: str,
    s_col: str,
    e_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of every point row to every interval row with the
    same ``by`` key and ``s_col ≤ t_col ≤ e_col``.  Numeric columns
    (epoch seconds/µs, ids…); returns point columns + the interval's
    ``s_col``/``e_col`` (interval ``by`` dropped as redundant)."""
    p = points.withColumn("__bk", F.floor(F.col(t_col) / bucket_width))
    iv = intervals.select(
        F.col(by).alias("__iby"),
        F.col(s_col).alias("__s"),
        F.col(e_col).alias("__e"),
    ).withColumn(
        "__bk",
        F.explode(
            F.sequence(
                F.floor(F.col("__s") / bucket_width),
                F.floor(F.col("__e") / bucket_width),
            )
        ),
    )
    joined = p.join(
        iv,
        (p[by] == iv["__iby"])
        & (p["__bk"] == iv["__bk"])
        & (p[t_col] >= iv["__s"])
        & (p[t_col] <= iv["__e"]),
        "inner",
    )
    return joined.select(
        *points.columns,
        F.col("__s").alias(s_col),
        F.col("__e").alias(e_col),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    bucket_width: int,
    l_s: str = "l_start",
    l_e: str = "l_end",
    r_s: str = "r_start",
    r_e: str = "r_end",
) -> DataFrame:
    """Interval×interval overlap join (inclusive: ``l_s ≤ r_e AND
    r_s ≤ l_e``) for same-``by`` rows, as a bucketed equi-join.

    Both sides explode to their covered buckets; the equi-join on
    (key, bucket) meets every overlapping pair in every SHARED bucket,
    so each pair is charged to exactly one — the bucket containing the
    overlap's start ``max(l_s, r_s)`` — instead of paying a distinct
    over the pair blow-up (same first-match discipline as the simhash
    multiprobe tables).  Intermediate size is Σ span/width per side;
    no pairwise product at any scale.

    Columns ``l_s``/``l_e`` must exist in ``left`` and ``r_s``/``r_e``
    in ``right``; all numeric (epoch µs, ids…)."""
    lb = left.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                F.floor(F.col(l_s) / bucket_width),
                F.floor(F.col(l_e) / bucket_width),
            )
        ),
    )
    rb = right.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                F.floor(F.col(r_s) / bucket_width),
                F.floor(F.col(r_e) / bucket_width),
            )
        ),
    ).withColumnRenamed(by, "__rby")
    ov_start = F.greatest(F.col(l_s), F.col(r_s))
    joined = lb.join(
        rb,
        (lb[by] == rb["__rby"])
        & (lb["__bk"] == rb["__bk"])
        & (F.col(l_s) <= F.col(r_e))
        & (F.col(r_s) <= F.col(l_e))
        & (lb["__bk"] == F.floor(ov_start / bucket_width)),
        "inner",
    )
    return joined.drop("__bk", "__rby")
