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

__all__ = ["largest_remainder"]


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
