"""Probabilistic record linkage: blocking + Fellegi–Sunter scoring.

The classic entity-resolution pipeline (Fellegi & Sunter, JASA 1969):
candidate pairs come from BLOCKING (only records sharing a cheap key
are compared — never all-pairs), each pair gets a field-agreement
vector, and the match score is the sum of per-field log-likelihood
weights ln(m/u) on agreement and ln((1−m)/(1−u)) on disagreement,
where m = P(agree | match) and u = P(agree | non-match).

The reference has no counterpart; this is extension surface for the
dedup/curation family (linking user records, merchant catalogs,
citation databases before training on them).

Exactness: the m/u probabilities are caller-supplied LITERALS, so the
per-field weights are computed ONCE in Python (``math.log`` on the
driver) and embedded as double literals in both the Spark plan and
the oracle SQL — no engine-side ``ln`` at all.  The score is a
fixed-field-order left-associative sum of those literals, bit-exact
everywhere.

Scale: the block self-join is the only shuffle; ``max_block``
reuses the drop-the-flood contract (a block too big to compare is an
upstream keying problem, not a linkage one).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["FieldSpec", "block_pairs", "fs_score", "sorted_neighborhood_pairs"]


class FieldSpec:
    """One comparison field: ``agree_expr(left, right) -> Column``
    (boolean), plus the (m, u) probabilities.  ``name`` labels the
    output agreement column."""

    def __init__(self, name: str, m: float, u: float):
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                f"need 0 < u < m < 1 for field {name!r} (got m={m}, u={u})"
            )
        self.name = name
        self.m = m
        self.u = u

    @property
    def w_agree(self) -> float:
        return math.log(self.m / self.u)

    @property
    def w_disagree(self) -> float:
        return math.log((1.0 - self.m) / (1.0 - self.u))


def block_pairs(
    df: DataFrame,
    id_col: str,
    block_col: str,
    max_block: int | None = None,
) -> DataFrame:
    """Candidate pairs within blocks: records sharing ``block_col``,
    ``id_a < id_b``.  Every non-id column comes back twice with
    ``_a``/``_b`` suffixes for the scoring stage.  Blocks larger than
    ``max_block`` are dropped wholesale (explicit truncation — a
    flooded block emits O(m²) pairs in one task)."""
    cols = [c for c in df.columns if c != id_col]
    base = df.select(F.col(id_col).alias("__id"), *cols)
    if max_block is not None:
        w = Window.partitionBy(block_col)
        base = (
            base.withColumn("__bn", F.count(F.lit(1)).over(w))
            .filter(F.col("__bn") <= max_block)
            .drop("__bn")
        )
    a = base.select(
        F.col("__id").alias("id_a"),
        F.col(block_col).alias("__blk"),
        *[F.col(c).alias(f"{c}_a") for c in cols if c != block_col],
    )
    b = base.select(
        F.col("__id").alias("id_b"),
        F.col(block_col).alias("__blk"),
        *[F.col(c).alias(f"{c}_b") for c in cols if c != block_col],
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumnRenamed("__blk", block_col)
    )


def fs_score(
    pairs: DataFrame,
    agreements: list[tuple["FieldSpec", Column]],
    threshold: float | None = None,
) -> DataFrame:
    """Fellegi–Sunter match score over candidate pairs.

    ``agreements`` is ``[(FieldSpec, agree_column), ...]`` — the
    boolean agreement expressions evaluated on the paired columns.
    Score = Σ fields (agree ? ln(mᵢ/uᵢ) : ln((1−mᵢ)/(1−uᵢ))), summed
    left-associatively in the given field order with driver-computed
    double literals (no engine-side log — see module docstring).
    NULL agreement (missing field) contributes 0 — the standard
    "no information" convention.

    Adds ``agree_{name}`` per field and ``fs_score``; ``threshold``
    filters to candidate matches.
    """
    out = pairs
    score: Column = F.lit(0.0)
    for spec, agree in agreements:
        a = F.when(
            agree.isNull(), F.lit(0.0)
        ).when(agree, F.lit(spec.w_agree)).otherwise(F.lit(spec.w_disagree))
        out = out.withColumn(f"agree_{spec.name}", agree)
        score = score + a
    out = out.withColumn("fs_score", score)
    if threshold is not None:
        out = out.filter(F.col("fs_score") >= threshold)
    return out


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_key: Column,
    window: int = 5,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95) —
    the OTHER classic ER candidate generator: order records by a
    fuzzy sort key (name prefix, zip, phonetic code) and pair each
    record with its ``window`` successors.  Where hash blocking
    misses near-boundary records with unequal keys, the sliding
    window catches anything that SORTS nearby.

    Distributed shape: one global rank (range-partitioned sort — the
    one unavoidable total order), then the neighbor join is an
    EQUI-join on the rank BUCKET (``rank // window``): any pair
    within ``window`` positions sits in the same or adjacent bucket,
    so the join key is bucketed-bounded (≤ 2·window candidates per
    record, never a cross product) and the rank-distance filter
    applies after.  Deterministic: ties in the sort key fall to the
    id.

    Returns ``id_a, id_b, rank_a, rank_b`` with ``rank_b − rank_a ∈
    [1, window]``.
    """
    from db_factfinder_spark.operators.ranking import global_rank

    base = df.select(F.col(id_col).alias("__id"), sort_key.alias("__k"))
    ranked = global_rank(base, ["__k", "__id"]).select(
        "__id", F.col("rank").alias("__r")
    )
    # explicit floor: Spark's double->long cast truncates but DuckDB's
    # CAST rounds — floor() is the portable bucket rule
    b = ranked.select(
        "__id", "__r",
        F.floor(F.col("__r") / window).cast("long").alias("__b"),
    )
    left = b.select(
        F.col("__id").alias("id_a"),
        F.col("__r").alias("rank_a"),
        F.col("__b").alias("__b"),
    )
    probes = b.select(
        F.col("__id").alias("id_b"),
        F.col("__r").alias("rank_b"),
        F.explode(
            F.array(F.col("__b") - 1, F.col("__b"))
        ).alias("__b"),
    )
    return (
        left.join(probes, "__b")
        .filter(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") - F.col("rank_a") <= window)
        )
        .select("id_a", "id_b", "rank_a", "rank_b")
    )
