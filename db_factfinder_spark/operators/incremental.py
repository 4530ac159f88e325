"""Incremental aggregate maintenance — algebraic partial states.

A 100 TB metrics table is never recomputed from scratch: each load
aggregates only the new partition into a *state* and merges it with
the stored state.  That works exactly when the aggregate is algebraic
— the state (n, sum, min, max) composes associatively — and when the
sum representation is order-independent, so merge order can't flip a
low bit.  Sums here are micro-unit longs (exact for fixed-decimal
measures); the merged state is therefore bit-identical to a direct
aggregation over all the data, which is what the oracle checks.

``agg_state`` is one map-side-combined shuffle over the new data only;
``merge_agg_states`` unions the (tiny) state tables and re-folds —
cost proportional to the number of groups, not the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    decimals: int = 2,
) -> DataFrame:
    """Per-key algebraic state of ``value_col``: row count, exact
    micro-unit sum (``floor(x·10^d + 0.5)`` longs — tie-free for
    d-decimal inputs, order-independent), min and max."""
    scale = float(10 ** decimals)
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(v * F.lit(scale) + F.lit(0.5))).alias("sum_units"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_agg_states(
    states: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Fold any number of ``agg_state`` outputs into one: counts and
    unit-sums add, min/max fold.  Keys absent from one state simply
    contribute nothing — no outer-join bookkeeping."""
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_units").alias("sum_units"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def state_to_result(state: DataFrame, decimals: int = 2) -> DataFrame:
    """Present a state: unit-sum back to a double measure."""
    scale = float(10 ** decimals)
    return state.withColumn(
        "sum_v", F.col("sum_units").cast("double") / F.lit(scale)
    ).drop("sum_units")


def incremental_join_update(
    prev_join: DataFrame,
    a_delta: DataFrame,
    b_delta: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    a_key: str,
    b_key: str,
) -> DataFrame:
    """Insert-only incremental view maintenance for an inner equi-join
    — the delta rule Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB,
    appended to the previously materialized join.

    The point at 100 TB: a nightly load's delta is a fraction of a
    percent of the table, so the three delta joins touch |ΔA|·|B|-
    keyed work instead of re-running the full A ⋈ B — and because the
    rule is exact set algebra over insert-only streams, the maintained
    view is ROW-IDENTICAL to a from-scratch recompute (which is what
    the oracle checks).  Deletes/updates need the CDC merge
    (`operators/merge.py`) upstream to turn the feed insert-only.

    Each delta join broadcasts its (small) delta side by default via
    AQE; keys shuffle identically to the full join, so skew handling
    (q43/q131) composes unchanged.
    """
    d1 = a_delta.join(b_old, a_delta[a_key] == b_old[b_key])
    d2 = a_old.join(b_delta, a_old[a_key] == b_delta[b_key])
    d3 = a_delta.join(b_delta, a_delta[a_key] == b_delta[b_key])
    return prev_join.unionByName(d1).unionByName(d2).unionByName(d3)


def apply_deletes(
    state: DataFrame,
    delete_state: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Retraction step of incremental view maintenance: subtract a
    delete batch's ``agg_state`` from the stored state.

    Count and unit-sum retract EXACTLY (they are group
    homomorphisms); min/max do not — deleting the current minimum
    says nothing about the next one — so affected groups get their
    min/max INVALIDATED (NULL) and ``refresh_minmax`` recomputes just
    those from the remaining base.  This is the standard IVM split:
    delta-proportional arithmetic for the retractable aggregates, a
    delta-BOUNDED partial recompute for the non-retractable ones —
    never a full-view rebuild.

    One outer join on the (tiny) state tables; groups whose count
    reaches zero disappear from the view.  Precondition (caller's
    ledger discipline, asserted in tests): deletes are a subset of
    previously inserted rows, so counts never go negative.
    """
    d = delete_state.select(
        *keys,
        F.col("n").alias("__dn"),
        F.col("sum_units").alias("__dsum"),
    )
    merged = state.join(d, list(keys), "left")
    affected = F.col("__dn").isNotNull()
    return (
        merged.select(
            *keys,
            (F.col("n") - F.coalesce("__dn", F.lit(0))).alias("n"),
            (
                F.col("sum_units") - F.coalesce("__dsum", F.lit(0))
            ).alias("sum_units"),
            F.when(affected, F.lit(None)).otherwise(F.col("min_v"))
            .alias("min_v"),
            F.when(affected, F.lit(None)).otherwise(F.col("max_v"))
            .alias("max_v"),
        )
        .filter(F.col("n") > 0)
    )


def refresh_minmax(
    state: DataFrame,
    remaining: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Recompute min/max ONLY for groups ``apply_deletes`` invalidated
    (min_v IS NULL): the affected key set semi-joins the remaining
    base — at 100 TB that prunes the rescan to the touched
    partitions/groups, the delta-bounded cost IVM promises — and the
    fresh extrema coalesce back into the state.  Untouched groups
    never re-read the base."""
    affected = state.filter(F.col("min_v").isNull()).select(*keys)
    fresh = (
        remaining.join(F.broadcast(affected), list(keys))
        .groupBy(*keys)
        .agg(
            F.min(F.col(value_col)).alias("__fmin"),
            F.max(F.col(value_col)).alias("__fmax"),
        )
    )
    return (
        state.join(fresh, list(keys), "left")
        .select(
            *keys,
            "n",
            "sum_units",
            F.coalesce("min_v", "__fmin").alias("min_v"),
            F.coalesce("max_v", "__fmax").alias("max_v"),
        )
    )
