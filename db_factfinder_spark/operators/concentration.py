"""Inequality / concentration measures as exact-arithmetic grouped
aggregates.

The Gini coefficient is the standard "how concentrated is spend /
tokens / traffic across members" audit a curation pipeline runs before
sampling decisions (a corpus where 1% of domains contribute 80% of
tokens needs domain caps — see ``llmdata/sampling.py``).  The textbook
estimator over ascending-sorted values x_1..x_n is

    G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)

which this module evaluates with integer-exact sufficient statistics:
values enter as integer cents, ranks come from one ``row_number``
window, and the two sums accumulate as ``decimal(38,0)`` so nothing
rounds until the single final IEEE division.  Ties in x are harmless
by construction: equal values contribute x·Σ(ranks) regardless of
which tied row gets which rank, so the estimator is deterministic even
though ``row_number`` needs a tie-break to be.

Scale: one shuffle on the group key serves both the rank window and
the final aggregate (the window's hash-partitioning is reused — no
second exchange), and the per-group sort is Spark's spillable
external sort, so a group larger than executor memory degrades to
disk, not OOM.  Sufficient statistics are three numbers per group;
nothing row-sized crosses the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gini_concentration"]


def gini_concentration(
    df: DataFrame,
    group_col: str,
    cents_col: Column,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group Gini coefficient of an integer-cents value column.

    ``cents_col`` must be an integral-valued column (use
    ``floor(x*100 + 0.5)`` upstream for money);  ``tiebreak_col``
    makes the rank window deterministic (any unique id).

    Output: ``<group_col>, n, gini`` — n exact, gini the one final
    division of two decimal(38,0) sums (exactly representable — hence
    bit-identical across engines — whenever they fit in 2^53, true for
    every tested scale; beyond that both engines round-to-nearest the
    same way).
    """
    w = Window.partitionBy(group_col).orderBy(cents_col, tiebreak_col)
    ranked = df.select(
        group_col,
        cents_col.cast("decimal(19,0)").alias("_x"),
        F.row_number().over(w).cast("decimal(19,0)").alias("_i"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_s"),
        F.sum(F.col("_i") * F.col("_x")).alias("_si"),
    )
    num = (
        F.lit(2).cast("decimal(19,0)") * F.col("_si")
        - (F.col("n") + F.lit(1)).cast("decimal(19,0)") * F.col("_s")
    )
    den = F.col("n").cast("decimal(19,0)") * F.col("_s")
    return agg.select(
        group_col,
        "n",
        (num.cast("double") / den.cast("double")).alias("gini"),
    )
