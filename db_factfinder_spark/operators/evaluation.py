"""Model-evaluation statistics as exact distributed aggregations.

AUC (area under the ROC curve) equals the Mann–Whitney U statistic
normalised by n_pos·n_neg — the probability a random positive
outscores a random negative, with ties counted half.  The naive
computation ranks every row through one ``row_number() OVER (ORDER BY
score)`` task (the single-partition-window scale-killer), or worse,
compares all pos×neg pairs.  Here the rank pass runs over DISTINCT
scores per group: one groupBy on (group, score) collapses the table
to its score histogram, and the cumulative window that assigns
tied-average ranks orders only that (bounded) histogram.

All rank arithmetic is ×2-scaled to stay in exact integers — the
tied-average rank of a run [lo..hi] is (lo+hi)/2, so twice it,
2·cum_before + cnt + 1, is always integral — and the single IEEE
division at the end makes the statistic bit-reproducible on any
engine (the same exactness rule as functions/stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["grouped_auc"]


def grouped_auc(
    df: DataFrame,
    group_cols: list[str],
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Exact tie-corrected AUC of ``score_col`` against the boolean
    ``label_col``, per group.

    Mann–Whitney with tied-average ranks:

        rank-sum₂(pos) = Σ_scores pos_cnt · (2·cum_before + cnt + 1)
        AUC = (rank-sum₂(pos) − n_pos·(n_pos+1)) / (2·n_pos·n_neg)

    where ``cum_before`` is the row count strictly below the score.
    Rows with a NULL label or score are ignored.  Groups with only
    one class present get a NULL ``auc`` (the statistic is
    undefined), never a division error.

    Plan: one shuffle to the per-(group, score) histogram; a
    cumulative window over the histogram ordered by score (partition
    = group, rows = distinct scores — bounded, not table-sized); one
    final groupBy back to the group grain.  Scores can be any
    orderable type; integer scores (cents) keep every intermediate
    exact.

    Output: ``group_cols…, n_pos, n_neg, auc``.
    """
    valid = df.filter(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    )
    hist = valid.groupBy(*group_cols, score_col).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos_cnt"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.withColumn(
        "avg_rank2",
        2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
        + F.col("cnt")
        + F.lit(1),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.sum("pos_cnt").cast("long").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos_cnt")).cast("long").alias("n_neg"),
        F.sum(F.col("pos_cnt") * F.col("avg_rank2"))
        .cast("long")
        .alias("ranksum2"),
    )
    defined = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.when(
            defined,
            (
                F.col("ranksum2") - F.col("n_pos") * (F.col("n_pos") + 1)
            ).cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("auc"),
    )


def decile_gains(
    df: DataFrame,
    label_col: str,
    score_col: str,
    tiebreak_col: str,
    n_buckets: int = 10,
    partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Cumulative-gains (lift) table: rank the population by score
    descending, cut it into ``n_buckets`` equal-count buckets, and
    report each bucket's positive rate plus the cumulative share of
    ALL positives captured down to that bucket — the model-quality
    readout campaign targeting reads ("the top decile captures X% of
    conversions").

    The ranking reuses ``global_rank`` (range-repartition + offset
    broadcast), so no single-partition ORDER BY window anywhere;
    descending order falls out of ranking ascending on the NEGATED
    long score (exact for longs) with the tiebreak ascending.  Bucket
    assignment is pure integer arithmetic, ``(rank−1)·n_buckets div
    N``, against the one-row population count broadcast by crossJoin
    (the repo's scalar-total idiom); the cumulative window then runs
    over the ``n_buckets``-row aggregate, never the population.

    Output: ``bucket (0 = best), n_rows, n_pos, pos_rate, cum_gain``
    — both ratios exact-int divisions.
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize
    from db_factfinder_spark.operators.ranking import global_rank

    src = df.select(
        F.col(label_col).cast("long").alias("__y"),
        (-F.col(score_col).cast("long")).alias("__neg"),
        F.col(tiebreak_col).alias("__tb"),
    )
    ranked = materialize(
        global_rank(
            src,
            ["__neg", "__tb"],
            partitions=partitions,
            checkpoint_mode=checkpoint_mode,
        ),
        checkpoint_mode,
    )
    n_total = ranked.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    buckets = (
        ranked.crossJoin(F.broadcast(n_total))
        .select(
            F.expr(f"(rank - 1L) * {n_buckets}L div __N").alias("bucket"),
            "__y",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__y").cast("long").alias("n_pos"),
        )
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return buckets.select(
        "bucket",
        "n_rows",
        "n_pos",
        (F.col("n_pos").cast("double") / F.col("n_rows").cast("double"))
        .alias("pos_rate"),
        F.when(
            F.sum("n_pos").over(w_all) > 0,
            F.sum("n_pos").over(w_cum).cast("double")
            / F.sum("n_pos").over(w_all).cast("double"),
        ).alias("cum_gain"),
    )
