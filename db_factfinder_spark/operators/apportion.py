"""Largest-remainder (Hamilton) apportionment in exact integers.

The census bureau's own problem: divide a fixed number of seats (or a
sample budget, or a quota) across groups in proportion to integer
weights, with the discrete leftovers going to the largest fractional
remainders.  This is the allocation rule behind factfinder-style
published counts that must sum exactly to a constrained total
(reference analogy: the crosswalk ratio apportionment in
``geolookup/2020/build.sql`` distributes block counts so parts sum to
the whole; here the engine gets the generic operator).

Everything is exact int64 — quota numerator ``w·seats``, base share
``w·seats DIV W``, remainder ``(w·seats) % W`` — so results are
bit-identical under any partitioning; there is no floating-point
quota anywhere.  Ties on the remainder break deterministically by key.

Scale shape: the weight total and the leftover-seat count cross the
plan as one-row broadcast aggregates.  The remainder rank is a global
``row_number`` — apportionment domains are small by construction
(states, nations, strata: thousands at most), so the single-partition
sort is bounded and deliberate, the same bounded-domain argument the
raking operator documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "largest_remainder",
    "maxmin_fair_allocate",
    "largest_remainder_grouped",
]


def largest_remainder(
    df: DataFrame, key_col: str, weight_col: str, seats: int
) -> DataFrame:
    """Apportion ``seats`` across ``key_col`` rows ∝ ``weight_col``.

    Returns ``{key_col}, {weight_col}, base, rem, alloc`` with
    ``sum(alloc) == seats`` exactly.  ``base = w·seats DIV W`` is the
    floor share, ``rem = (w·seats) % W`` the integer remainder; the
    ``seats − Σbase`` leftover seats go to the largest remainders
    (ties → ascending key).  Requires non-negative integer weights
    with a positive total.
    """
    tot = df.agg(F.sum(weight_col).cast("long").alias("w_total"))
    quota = df.crossJoin(F.broadcast(tot)).select(
        key_col,
        F.col(weight_col).cast("long").alias(weight_col),
        F.expr(
            f"CAST({weight_col} AS BIGINT) * {seats} DIV w_total"
        ).alias("base"),
        F.expr(
            f"(CAST({weight_col} AS BIGINT) * {seats}) % w_total"
        ).alias("rem"),
    )
    leftover = quota.agg(
        (F.lit(seats) - F.sum("base")).cast("long").alias("leftover")
    )
    ranked = quota.crossJoin(F.broadcast(leftover)).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.desc("rem"), F.asc(key_col))
        ),
    )
    return ranked.select(
        key_col,
        weight_col,
        "base",
        "rem",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc"),
    )


def maxmin_fair_allocate(
    df: DataFrame, key_col: str, demand_col: str, capacity: int
) -> DataFrame:
    """Max-min fair (water-filling) allocation in exact integers.

    The multi-tenant quota rule: satisfy small demands fully, split
    what remains evenly among the rest — no tenant can gain without a
    poorer one losing.  Uses the closed-form sorted solution instead
    of the iterative waterline: with demands sorted ascending, tenant
    *i* is fully satisfied iff ``d_i·(n−i) + prefix_i ≤ C`` (the flag
    is monotone), and every unsatisfied tenant gets an even integer
    split of the residual ``R = C − Σ satisfied``, the ``R % m``
    leftover units going +1 to the lowest keys — so Σalloc equals
    ``min(C, Σdemand)`` exactly and the max-min property
    ``unsatisfied alloc ≥ every satisfied demand`` holds in integers.

    Returns ``{key_col}, {demand_col}, alloc, satisfied``.

    Scale: one window pass over the (demand, key) sort plus one-row
    broadcast aggregates — the same bounded-domain global-sort
    argument as ``largest_remainder`` (tenant counts are small by
    construction).
    """
    w = Window.orderBy(F.asc("d"), F.asc(key_col))
    base = df.select(
        key_col, F.col(demand_col).cast("long").alias("d")
    ).withColumn("i", F.row_number().over(w)).withColumn(
        "prefix",
        F.sum("d").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    n_tot = base.agg(
        F.count(F.lit(1)).alias("n"),
    )
    flagged = base.crossJoin(F.broadcast(n_tot)).withColumn(
        "satisfied",
        F.col("d") * (F.col("n") - F.col("i")) + F.col("prefix")
        <= F.lit(capacity),
    )
    resid = flagged.agg(
        (
            F.lit(capacity)
            - F.coalesce(
                F.sum(F.when(F.col("satisfied"), F.col("d"))), F.lit(0)
            )
        ).alias("R"),
        F.sum(F.when(~F.col("satisfied"), 1).otherwise(0)).alias("m"),
    )
    wu = Window.orderBy(F.asc(key_col))
    ranked = flagged.withColumn(
        "u_rk",
        F.sum(F.when(~F.col("satisfied"), 1).otherwise(0)).over(
            wu.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return ranked.crossJoin(F.broadcast(resid)).select(
        key_col,
        F.col("d").alias(demand_col),
        F.when(F.col("satisfied"), F.col("d"))
        .otherwise(
            F.expr("R DIV m")
            + F.when(
                F.col("u_rk") <= F.expr("R % m"), 1
            ).otherwise(0)
        )
        .alias("alloc"),
        "satisfied",
    )


def largest_remainder_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    seats: DataFrame,
    seats_col: str = "seats",
) -> DataFrame:
    """Per-group Hamilton apportionment — top-down reconciliation.

    The hierarchical-forecast move: each parent's integer budget
    (``seats``: one row per group) is distributed across its children
    ∝ ``weight_col`` with largest-remainder leftovers, so every
    group's children sum EXACTLY to the parent total — the coherence
    constraint top-down reconciliation exists for.  Same exact-int
    arithmetic as :func:`largest_remainder`, with the global sort
    replaced by per-group windows and the scalar broadcasts by keyed
    aggregate joins, so groups apportion independently in one pass
    (no per-group driver loop).
    """
    w_tot = df.groupBy(group_col).agg(
        F.sum(weight_col).cast("long").alias("__W")
    )
    s = seats.select(
        group_col, F.col(seats_col).cast("long").alias("__S")
    )
    quota = (
        df.join(w_tot, group_col)
        .join(s, group_col)
        .select(
            group_col,
            key_col,
            F.col(weight_col).cast("long").alias(weight_col),
            F.expr(
                f"CAST({weight_col} AS BIGINT) * __S DIV __W"
            ).alias("base"),
            F.expr(
                f"(CAST({weight_col} AS BIGINT) * __S) % __W"
            ).alias("rem"),
            F.col("__S"),
        )
    )
    leftover = quota.groupBy(group_col).agg(
        (F.first("__S") - F.sum("base")).alias("__L")
    )
    wk = Window.partitionBy(group_col).orderBy(
        F.desc("rem"), F.asc(key_col)
    )
    return (
        quota.join(leftover, group_col)
        .withColumn("rk", F.row_number().over(wk))
        .select(
            group_col,
            key_col,
            weight_col,
            "base",
            "rem",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("__L"), 1).otherwise(0)
            ).alias("alloc"),
        )
    )
