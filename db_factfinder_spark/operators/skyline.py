"""2-D skyline (Pareto frontier) without a quadratic dominance join.

A point (cost, gain) is on the skyline iff no other point has
cost ≤ and gain ≥ with at least one strict.  The textbook NOT-EXISTS
formulation is O(n²); this operator uses the sort-free decomposition

    skyline(p, s)  ⇔  s = best(p)  ∧  s > prefix_best(p)

where ``best(p)`` is the max gain at exactly cost p and
``prefix_best(p)`` the max gain over all strictly cheaper costs:

* one groupBy(cost) reduces the corpus to its distinct-cost frame —
  the ONLY full-data shuffle, map-side combinable;
* the running prefix max is a window over the distinct-cost frame,
  which is bounded by the cost domain, not the row count (for a
  price-cent domain that is ≤ a few million rows at any corpus size —
  the single-partition window runs on the reduced frame, never the
  data);
* winners join back to the full table by (cost, gain) equi-join to
  recover every row achieving a frontier point (duplicates are
  mutually non-dominating and all kept, matching the strict-dominance
  definition).

Cost must be an exact (integer/decimal) column — callers convert
money to cents first; float costs would make range comparisons
ulp-fragile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(
    df: DataFrame, cost_col: str, gain_col: str
) -> DataFrame:
    """Rows minimizing ``cost_col`` while maximizing ``gain_col``
    (Pareto-optimal under strict dominance).  NULL cost/gain rows are
    excluded — NULL is not comparable, so it can neither dominate nor
    sit on the frontier."""
    pts = df.filter(
        F.col(cost_col).isNotNull() & F.col(gain_col).isNotNull()
    )
    per_cost = pts.groupBy(cost_col).agg(F.max(gain_col).alias("__best"))
    w = (
        Window.orderBy(cost_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_cost.withColumn("__prev", F.max("__best").over(w))
        .filter(
            F.col("__prev").isNull() | (F.col("__best") > F.col("__prev"))
        )
        .select(cost_col, F.col("__best").alias(gain_col))
    )
    return pts.join(frontier, [cost_col, gain_col], "left_semi")
