"""Multi-armed bandit analytics: UCB1 scores over serving logs.

UCB1 (Auer/Cesa-Bianchi/Fischer, ML 2002): rank arms by
``mean_reward + sqrt(2·ln N / n)`` — exploitation plus an optimism
bonus that shrinks as an arm accumulates pulls.  Over a serving log
this is the batch diagnostic: which arm WOULD the policy pull next,
and how much of each arm's rank is bonus vs evidence.

Exactness: rewards are integer-coded units (the ``grouped_linreg``
convention — callers code value·10^d), so per-arm sums are exact;
``ln N`` is ``portable_ln`` (bit-exact cross-engine); ``sqrt`` is
IEEE-correctly-rounded in every engine (the one libm function that
is); the remaining ops are mirrored single-rounded doubles.

One hash aggregate + a one-row broadcast; the rank window orders the
ARM frame (bounded by arm cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from db_factfinder_spark.functions.portable_math import portable_ln

__all__ = ["ucb1_scores"]


def ucb1_scores(
    df: DataFrame,
    arm_col: str,
    reward_units_col: str,
    unit_scale: int = 1,
) -> DataFrame:
    """Per-arm UCB1 statistics from an (arm, reward-units) log.

    ``reward_units_col`` must be integer-valued units;
    ``unit_scale`` converts the mean back (``mean = sum/n/scale``,
    two mirrored divisions).  Returns ``{arm_col}, n_pulls, total_n,
    reward_units, mean_reward, bonus, ucb, rank`` (rank 1 = next
    pull; ties by arm ascending).
    """
    per = df.groupBy(arm_col).agg(
        F.count(F.lit(1)).alias("n_pulls"),
        F.sum(F.col(reward_units_col).cast("long")).alias("reward_units"),
    )
    tot = per.agg(F.sum("n_pulls").alias("total_n"))
    j = per.crossJoin(F.broadcast(tot))
    mean = (
        F.col("reward_units").cast("double")
        / F.col("n_pulls").cast("double")
        / F.lit(float(unit_scale))
    )
    bonus = F.sqrt(
        F.lit(2.0)
        * portable_ln(F.col("total_n"))
        / F.col("n_pulls").cast("double")
    )
    w = Window.orderBy(F.desc("ucb"), F.asc(arm_col))
    return (
        j.select(
            arm_col,
            "n_pulls",
            "total_n",
            "reward_units",
            mean.alias("mean_reward"),
            bonus.alias("bonus"),
            (mean + bonus).alias("ucb"),
        )
        .withColumn("rank", F.row_number().over(w))
    )
