"""Spatial distance self-join via grid bucketing — the planar version
of the LSH-bucket pattern: points land in cells of side ``cell``; a
pair within radius r ≤ cell can only live in the same or one of the 8
neighboring cells, so candidate generation is an EQUI-join on the cell
key (each point probes its 3×3 neighborhood — constant fan-out) and
the exact distance check runs on candidates only.  A naive distance
join is the all-pairs cross product no cluster survives.

Integer-exact by construction: coordinates are integers (projected /
fixed-point), squared Euclidean distance is exact int64, and the
radius compares as r² — no sqrt, no libm, any engine agrees
bit-for-bit.  (Geographic deployments project lon/lat to integer
metres first; the haversine small-angle error at city scale is far
below fixed-point resolution.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grid_distance_pairs(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    cell: int | None = None,
) -> DataFrame:
    """Pairs (a, b), a < b, with squared distance ≤ radius² — one
    cell-key equi-join, no cross product.

    ``cell`` defaults to ``radius`` (the no-false-negative minimum:
    with cell ≥ r, a pair within r spans at most one cell boundary
    per axis, so b's cell is within a's 3×3 neighborhood).  Each LEFT
    point explodes to its 9 neighbor cells; RIGHT points post ONCE to
    their own cell — the same asymmetric-index trick as the SimHash
    tables, so join fan-out is 9×n, never 81×n.  Duplicate candidate
    pairs cannot arise (b's single cell meets exactly one of a's nine
    probes), so no distinct is needed.

    Output: ``id_a, id_b, d2`` (exact squared distance).
    """
    if cell is None:
        cell = radius
    if cell < radius:
        raise ValueError("cell must be >= radius for 3x3 completeness")
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        (F.floor(F.col(x_col).cast("long") / cell)).alias("cx"),
        (F.floor(F.col(y_col).cast("long") / cell)).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("kx"),
        (F.col("cy") + F.col("o.dy")).alias("ky"),
    )
    posts = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("kx"),
        F.col("cy").alias("ky"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probes.join(posts, ["kx", "ky"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("d2", d2)
        .filter(F.col("d2") <= radius * radius)
        .select("id_a", "id_b", "d2")
    )
