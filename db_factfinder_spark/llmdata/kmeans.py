"""Distributed k-means (spherical / cosine Lloyd iterations) — the
iterative-algorithm pattern on Spark.

Per iteration:

* **assign** — one map-side pass: the k current centroids are embedded
  as plan literals, each row folds over them for the argmax-cosine
  cluster.  No join, no shuffle; at 100 TB this is a single scan.
* **update** — one aggregation shuffle: posexplode the assigned
  vectors, per-(cluster, position) exact decimal mean (quantized to 6
  decimals so the next iteration's literals are bit-identical in any
  engine), collect k×dim floats back to the driver.

Only the k×dim centroid matrix ever crosses the driver boundary —
the same shape MLlib's KMeans uses, expressed in DataFrame ops.  The
whole fit is deterministic: seeding is "k lowest-id vectors", sums are
exact decimals, ties break to the lowest cluster id — so a fixed
iteration count unrolls into plain SQL (the DuckDB oracle chains one
CTE pair per iteration).

Empty clusters keep their previous centroid.  Zero-norm vectors have
NULL cosine to every centroid and stay unassigned (excluded from both
updates and the returned assignment) — grouping them into a cluster
would be an artifact of the tie-break, not the data.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_factfinder_spark.functions.expr import let
from db_factfinder_spark.llmdata.similarity import _dot, vec_norm


def _seq_norm(vs: list[float]) -> float:
    """Driver-side L2 norm with the SAME accumulation order as the
    engines' sequential fold (acc + x·x left to right) — the centroid
    norms become plan literals but stay bit-identical to what DuckDB's
    ``sqrt(list_dot_product(cv, cv))`` computes per row."""
    acc = 0.0
    for x in vs:
        acc += x * x
    return math.sqrt(acc)


def _best_centroid(cent: list[tuple[int, list[float]]], vec_col: str) -> Column:
    """struct(cos, cid) of the argmax-cosine centroid; strict ``>`` in
    the fold keeps the first (lowest-cid) maximum — the same tie-break
    as ``row_number() OVER (ORDER BY cos DESC, cid ASC)``.

    The row's norm is let-bound (one fold instead of k) and each
    centroid's norm is a driver-computed literal (zero folds instead
    of k) — per row the k-way argmax costs k dot products + 1 norm."""
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(cid)).cast("long").alias("cid"),
                F.lit([float(x) for x in cv]).alias("cv"),
                F.lit(_seq_norm([float(x) for x in cv])).alias("cn"),
            )
            for cid, cv in cent
        ]
    )

    def body(vn: Column) -> Column:
        scored = F.transform(
            cent_arr,
            lambda ct: F.struct(
                F.try_divide(
                    _dot(F.col(vec_col), ct["cv"]), vn * ct["cn"]
                ).alias("cos"),
                ct["cid"].alias("cid"),
            ),
        )
        return F.aggregate(
            scored,
            F.struct(
                F.lit(float("-inf")).alias("cos"),
                F.lit(None).cast("long").alias("cid"),
            ),
            lambda acc, x: F.when(x["cos"] > acc["cos"], x).otherwise(acc),
        )

    return let(vec_norm(F.col(vec_col)), body)


def _updated_centroids(assigned: DataFrame) -> dict[int, list[float]]:
    """Per-cluster element-wise mean (exact decimal sum / count,
    half-even-quantized to 6 decimals), collected to the driver."""
    rows = (
        assigned.select("cid", F.posexplode("v").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(
            F.bround(
                F.sum(F.col("val").cast("decimal(20,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("cv")
        )
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("s"))
        .select("cid", F.transform("s", lambda x: x["cv"]).alias("cv"))
        .collect()
    )
    return {int(r["cid"]): [float(x) for x in r["cv"]] for r in rows}


def kmeans_assignments(
    df: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations and return the final assignment
    ``(id_col, cluster_id, cosine)``.  Cluster ids are the seed rows'
    ``id_col`` values (the k lowest), so no renumbering step exists to
    introduce nondeterminism."""
    e = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    seeds = e.orderBy("id").limit(k).collect()
    cent = [(int(r["id"]), [float(x) for x in r["v"]]) for r in seeds]
    for _ in range(iters):
        best = _best_centroid(cent, "v")
        # NULL cid ⇔ no centroid ever won the fold (zero-norm vector:
        # every cosine NULL, the accumulator's cos is -inf — NOT null —
        # so the unassigned gate must be the cid, not the cos)
        assigned = e.select(
            "id", "v", best["cid"].alias("cid"), best["cos"].alias("cos")
        ).filter(F.col("cid").isNotNull())
        upd = _updated_centroids(assigned)
        cent = [(cid, upd.get(cid, cv)) for cid, cv in cent]
    best = _best_centroid(cent, "v")
    return (
        e.select(
            F.col("id").alias(id_col),
            best["cid"].alias("cluster_id"),
            best["cos"].alias("cosine"),
        )
        .filter(F.col("cluster_id").isNotNull())
    )
