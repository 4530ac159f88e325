"""Bounded-depth hierarchy (tree) subtree aggregation.

Parent-child rollups ("subtree total per category node") are usually
written with recursive CTEs or iterative self-joins — per-level
shuffles, depth-many passes.  For the hierarchies data platforms
actually have (category trees, org charts, geo containment: depth is
a small constant), the scalable identity is the ANCESTOR CLOSURE:
each leaf emits its ≤ depth+1 ancestors as a map-side array, one
explode + one groupBy aggregates every subtree simultaneously — zero
recursion, zero per-level passes, work = leaves × depth.

(The factfinder geo rollup, operators/vertical.py, is the crosswalk-
join special case of this with depth 1 per step; this operator is the
general tree form.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["decimal_ancestors", "subtree_rollup"]


def decimal_ancestors(node_col: str, levels: int) -> Column:
    """Ancestor array (self included, duplicates removed) for the
    implicit decimal tree parent(k) = k div 10 — ``levels`` integer
    divisions, all exact ``div`` (never float ``/``, whose 2⁵³
    ceiling a 64-bit id can cross).  Duplicates appear once k hits
    the root (k div 10^j = 0 for every larger j); ``array_distinct``
    keeps each ancestor once so the root is charged once per leaf.
    """
    if levels < 1:
        raise ValueError("levels must be >= 1")
    terms = ", ".join(
        f"({node_col} div {10 ** j}L)" for j in range(levels + 1)
    )
    return F.expr(f"array_distinct(array({terms}))")


def subtree_rollup(
    df: DataFrame,
    node_col: str,
    value_col: str,
    ancestors: Column,
) -> DataFrame:
    """Subtree aggregate for EVERY node of a bounded-depth hierarchy
    in one pass: ``ancestors`` is an array column listing the leaf's
    own node plus all its ancestors (see ``decimal_ancestors`` for
    the decimal tree; geo/category closures are the same shape).

    Plan: map-side ancestor array → explode (≤ depth+1 rows per
    leaf) → ONE partial-aggregated groupBy on the ancestor id.  The
    exploded key is the tree node, so skew equals subtree size — the
    root key receives one PARTIAL per map task (map-side combine),
    never one row per leaf.

    Output: ``node, n_leaves, subtree_sum`` (exact long sum of
    ``value_col``).
    """
    return (
        df.select(
            F.col(value_col).cast("long").alias("__v"),
            F.explode(ancestors).alias("node"),
        )
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_leaves"),
            F.sum("__v").alias("subtree_sum"),
        )
    )
