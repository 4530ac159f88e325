"""Distributed global ranking and rank-based distribution transforms.

``row_number() OVER (ORDER BY x)`` with no partition key moves the
ENTIRE table through one task — the canonical accidental scale-killer
(WindowExec even warns).  The classic distributed alternative computed
here: range-repartition on the order key (each partition owns a
contiguous value range), sort within partitions, then add each
partition's cumulative row offset — P offsets cross the driver, not
rows.  Output ranks are identical to the single-partition window for
a UNIQUE order key (callers must include a tiebreak column), and
independent of partition boundaries by construction, so the sampling
inside ``repartitionByRange`` can't perturb results.

``quantile_normalize`` builds on it: the batch-effect correction that
maps each group's empirical distribution onto the global one (rank r
of n_g in its group → the global exact lower quantile at p = r/n_g).
All-integer index arithmetic — the mapped index is
ceil(r·N / n_g) = (r·N + n_g − 1) div n_g — and one equi-join against
the globally ranked values; no interpolation, no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from db_factfinder_spark.llmdata.checkpointing import materialize

__all__ = ["global_rank", "quantile_normalize"]


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Dense 1-based global rank by ``order_cols`` (must be unique as
    a tuple — include a tiebreak), WITHOUT a single-partition window.

    Plan: range-repartition on the keys → per-partition sort +
    ``row_number`` (parallel) → add the broadcast cumulative offset of
    each partition.  The repartitioned frame is materialized once so
    the offset count and the ranked pass see the same (sampled)
    boundaries.  Returns the input columns plus ``rank``.
    """
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    parts = materialize(
        df.repartitionByRange(p, *cols).withColumn(
            "__pid", F.spark_partition_id()
        ),
        checkpoint_mode,
    )
    sizes = (
        parts.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy("__pid")
        .collect()
    )
    offsets, acc = {}, 0
    for row in sizes:
        offsets[row["__pid"]] = acc
        acc += row["__n"]
    off_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "__pid int, __off long",
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        parts.join(F.broadcast(off_df), "__pid")
        .withColumn(
            "rank", F.row_number().over(w).cast("long") + F.col("__off")
        )
        .drop("__pid", "__off")
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Map every group's empirical distribution onto the GLOBAL one —
    rank r of n_g within the group lands on the global exact lower
    quantile at p = r/n_g (the value with global rank
    ceil(r·N / n_g)).  A group identical to the global distribution
    maps (almost) onto itself; skewed groups are pulled to the common
    scale — the rank-based batch-effect correction.

    Exactness: within-group ranks come from one keyed window; global
    ranks from ``global_rank`` (range-partitioned, never a lone
    task); the index arithmetic is pure integer; the mapped value
    arrives via an equi-join on the index.  Output:
    ``<id_col>, <group_col>, <value_col>, norm`` (norm has
    ``value_col``'s type — no floats introduced).
    """
    src = materialize(
        df.select(group_col, value_col, id_col), checkpoint_mode
    )
    ranked_global = global_rank(
        src.select(F.col(value_col).alias("__gv"), F.col(id_col).alias("__gid")),
        ["__gv", "__gid"],
        partitions=partitions,
        checkpoint_mode=checkpoint_mode,
    ).select(F.col("rank").alias("__i"), F.col("__gv").alias("norm"))
    wg = Window.partitionBy(group_col).orderBy(value_col, id_col)
    wn = Window.partitionBy(group_col)
    n_total = src.count()
    grouped = src.select(
        id_col,
        group_col,
        value_col,
        F.row_number().over(wg).cast("long").alias("__r"),
        F.count(F.lit(1)).over(wn).cast("long").alias("__ng"),
    ).withColumn(
        "__i",
        F.expr(f"(__r * {n_total}L + __ng - 1L) div __ng"),
    )
    return grouped.join(ranked_global, "__i").select(
        id_col, group_col, value_col, "norm"
    )


def topn_plus_other(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    measure: Column,
    n: int = 3,
) -> DataFrame:
    """The BI "top-N + OTHER" rollup: per group, the ``n`` largest
    items by an exact-integer measure keep their identity; everything
    else collapses into one ``OTHER`` row — total mass is conserved
    exactly (the OTHER row is the group total minus the named rows,
    all integer sums).

    Plan: one (group, item) aggregation (map-side combined), a
    row_number window over the per-group ITEM list (bounded by item
    cardinality, never raw rows), then a conditional re-aggregation
    on the winner flag.  Ties break by item ascending — ranks and
    membership are deterministic.

    Output: ``group_cols…, item (OTHER for the tail), rank (n+1 for
    OTHER), n_rows, measure_total``.
    """
    per_item = (
        df.select(*group_cols, F.col(item_col).alias("item"),
                  measure.alias("__m"))
        .groupBy(*group_cols, "item")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__m").alias("__t"),
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("__t"), F.asc("item")
    )
    ranked = per_item.withColumn("rank", F.row_number().over(w))
    keep = F.col("rank") <= n
    return (
        ranked.select(
            *group_cols,
            F.when(keep, F.col("item")).otherwise(F.lit("OTHER"))
            .alias("item"),
            F.when(keep, F.col("rank")).otherwise(F.lit(n + 1))
            .alias("rank"),
            "n_rows",
            F.col("__t").alias("__t"),
        )
        .groupBy(*group_cols, "item", "rank")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("__t").alias("measure_total"),
        )
    )


def diversified_topn(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    n: int,
    floor_per_group: int = 1,
) -> DataFrame:
    """Global top-N with per-group representation floors — the
    feed-diversification rule (every category gets at least
    ``floor_per_group`` slots, the rest go to the best overall).

    Two deterministic passes: each group's top ``floor_per_group``
    items (score desc, id asc) are guaranteed in; the remaining
    ``n − floor-taken`` slots fill from the leftovers by global score
    order.  If the floors alone exceed ``n`` they are all kept (the
    floor is a guarantee, not a cap) and no fill happens.  All ranks
    are (score, id)-keyed, so the selection is partition-invariant.

    Returns ``{group_col}, {id_col}, {score_col}, via, sel_rank``
    where ``via`` ∈ {'floor', 'fill'} and ``sel_rank`` orders the
    final selection by (score desc, id asc).

    Scale: one per-group window, then the fill's global rank runs
    over a PRE-PRUNED frame — ``rest`` is first cut to per-group rank
    ≤ ``floor_per_group + n``.  Answer-preserving proof: the fill
    takes at most ``n`` items globally; an item with per-group rank
    beyond ``floor_per_group + n`` has ≥ n rest-items in its OWN
    group strictly ahead of it in the global (score desc, id asc)
    order, so its global fill rank is > n and it can never be
    selected.  The unpartitioned window therefore sorts at most
    ``n × |groups|`` rows instead of the whole non-floor input — the
    per-group window (a partitioned shuffle) has already done the
    heavy lifting.
    """
    wg = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    ranked = df.select(group_col, id_col, score_col).withColumn(
        "__rg", F.row_number().over(wg)
    )
    floors = ranked.filter(F.col("__rg") <= floor_per_group)
    n_floor = floors.agg(F.count(F.lit(1)).alias("__nf"))
    rest = ranked.filter(
        (F.col("__rg") > floor_per_group)
        & (F.col("__rg") <= floor_per_group + n)
    )
    wfill = Window.orderBy(F.desc(score_col), F.asc(id_col))
    fills = (
        rest.withColumn("__rf", F.row_number().over(wfill))
        .crossJoin(F.broadcast(n_floor))
        .filter(F.col("__rf") <= F.greatest(
            F.lit(n) - F.col("__nf"), F.lit(0)
        ))
    )
    sel = floors.select(
        group_col, id_col, score_col, F.lit("floor").alias("via")
    ).unionByName(
        fills.select(
            group_col, id_col, score_col, F.lit("fill").alias("via")
        )
    )
    wsel = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return sel.withColumn("sel_rank", F.row_number().over(wsel))
