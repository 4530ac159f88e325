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


def ancestor_closure(
    edges: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_rounds: int = 6,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Transitive ancestor closure of a parent-pointer table — Spark's
    scalable stand-in for ``WITH RECURSIVE``: POINTER DOUBLING.  The
    closure starts as the direct edges (distance 1); each round joins
    the closure WITH ITSELF (``a.ancestor = b.node``), so reachable
    distance DOUBLES per round and a depth-d hierarchy closes in
    ⌈log₂ d⌉ rounds — vs d rounds for the naive one-edge-at-a-time
    iteration a recursive CTE performs.  Each round is one self-join
    + distinct on a materialized frame (lineage truncated per
    ``checkpoint_mode``), with the kcore-style converged readout.

    Works for DAGs too (distinct collapses alternative
    decompositions of the same (node, ancestor, dist)); on a tree
    every path is unique so dist is single-valued per pair.  The
    oracle runs DuckDB's actual ``WITH RECURSIVE`` — two genuinely
    different algorithms agreeing pair-for-pair.

    Output: ``node, ancestor, dist, converged``.
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    cl = materialize(
        edges.select(
            F.col(child).alias("node"),
            F.col(parent).alias("ancestor"),
            F.lit(1).alias("dist"),
        ).distinct(),
        checkpoint_mode,
    )
    converged = False
    n_prev = cl.count()
    for _ in range(max_rounds):
        a = cl.select(
            F.col("node"), F.col("ancestor").alias("__mid"),
            F.col("dist").alias("__d1"),
        )
        b = cl.select(
            F.col("node").alias("__mid"),
            F.col("ancestor"),
            F.col("dist").alias("__d2"),
        )
        jumped = a.join(b, "__mid").select(
            "node", "ancestor",
            (F.col("__d1") + F.col("__d2")).alias("dist"),
        )
        cl = materialize(
            cl.unionByName(jumped).distinct(), checkpoint_mode
        )
        n_new = cl.count()
        if n_new == n_prev:
            converged = True
            break
        n_prev = n_new
    return cl.withColumn("converged", F.lit(converged))
