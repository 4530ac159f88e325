"""Join-output cardinality forecasting from per-key histograms.

Before committing a 100 TB shuffle join, a planner wants two numbers:
how many rows the join will emit, and whether one key dominates (the
skew that makes a single reducer run for hours).  Both are EXACT from
per-side key histograms — for an inner equi-join the output size is
Σ_k c_left(k)·c_right(k) — and the histograms cost one map-side
partial aggregate per side, reading only the key column (columnar
scans prune everything else).  This is the measurement step behind
the salting decisions in ``operators/skew.py``: ``salted_join`` picks
its salt factor and ``adaptive_salted_join`` its hot-key list from
exactly these counts.

Contrast with Catalyst's own CBO estimates (distinct-count based,
approximate): this operator is the exact-answer audit you run ONCE on
a recurring pipeline's keys and cache, not a per-query optimizer cost.

Everything is integer arithmetic on counts; the only division is the
final skew ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["equi_join_cardinality"]


def equi_join_cardinality(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Exact inner-equi-join output size + skew diagnostics, without
    running the join.

    Output (one row): ``n_keys`` matched distinct keys, ``est_rows``
    exact output cardinality, ``max_key_product`` the largest single
    key's contribution, ``skew_ratio`` = max_key_product · n_keys /
    est_rows (1.0 = perfectly uniform; ≫1 = one key dominates and the
    join wants salting — see `operators/skew.py`).

    Plan: one partial-aggregated groupBy per side (map-side combine
    collapses each partition to its local key counts before the
    exchange), an inner join of the two count tables (key cardinality,
    not row cardinality — usually broadcastable), and a scalar agg.
    """
    if left is right and left_key == right_key:
        # self-join forecast: one histogram serves both sides — the
        # per-key product is just c², no second scan, no count join
        prod = (
            left.groupBy(F.col(left_key).alias("k"))
            .agg(F.count(F.lit(1)).alias("lc"))
            .select((F.col("lc") * F.col("lc")).alias("p"))
        )
    else:
        lc = left.groupBy(F.col(left_key).alias("k")).agg(
            F.count(F.lit(1)).alias("lc")
        )
        rc = right.groupBy(F.col(right_key).alias("k")).agg(
            F.count(F.lit(1)).alias("rc")
        )
        prod = lc.join(rc, "k").select(
            (F.col("lc") * F.col("rc")).alias("p")
        )
    return prod.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("p").alias("est_rows"),
        F.max("p").alias("max_key_product"),
    ).select(
        "n_keys",
        "est_rows",
        "max_key_product",
        (
            (F.col("max_key_product") * F.col("n_keys")).cast("double")
            / F.col("est_rows").cast("double")
        ).alias("skew_ratio"),
    )
