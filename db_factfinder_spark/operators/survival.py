"""Discrete survival analysis over event-log lifespans.

The churn question ("of the users alive on day t, how many died?")
needs a RISK SET per day — naively a per-day rescan of every user's
span, i.e. days × users work.  The distributed identity used here is
the sweep line: each user contributes +1 at their first-seen day and
−1 the day after their last, so the risk set at any day is the
running sum of per-day net deltas — one groupBy to user spans, one
tiny per-day aggregate, one cumulative window over the day axis
(bounded by calendar length, not users; the ``cumulative_uniques``
precedent).

Censoring follows the standard right-censoring rule: a user whose
last event is within ``censor_gap`` days of the corpus's last
observed day hasn't (observably) churned — they leave the risk set
without a death event, exactly how Kaplan–Meier treats withdrawals.
The per-day hazard d/n is an exact-integer ratio; the cumulative
product survival curve is deliberately NOT emitted (an n-term float
product has no portable exact form) — consumers fold the hazard
column themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hazard_table"]


def hazard_table(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    censor_gap: int = 2,
) -> DataFrame:
    """Per-day risk set, death count, and discrete hazard d/n over
    the observed day span.

    A key's lifespan is [first day, last day]; it is AT RISK on every
    day of the span and "dies" on its last day unless that day is
    within ``censor_gap`` days of the global maximum day (censored).
    Output: ``day (date), n_risk, d_events, hazard`` for every
    calendar day in the observed span (hazard NULL on an empty risk
    set, which only occurs past every span).
    """
    if censor_gap < 0:
        raise ValueError("censor_gap must be >= 0")
    spans = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.min(
                F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
            ).alias("fd"),
            F.max(
                F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
            ).alias("ld"),
        )
    )
    glob = spans.agg(
        F.min("fd").alias("__mind"), F.max("ld").alias("__maxd")
    )
    spans = spans.crossJoin(F.broadcast(glob)).withColumn(
        "is_death", (F.col("__maxd") - F.col("ld")) > censor_gap
    )
    deltas = (
        spans.select(F.col("fd").alias("d"), F.lit(1).alias("delta"))
        .unionByName(
            spans.select(
                (F.col("ld") + 1).alias("d"), F.lit(-1).alias("delta")
            )
        )
        .groupBy("d")
        .agg(F.sum("delta").alias("net"))
    )
    deaths = (
        spans.filter("is_death")
        .groupBy(F.col("ld").alias("d"))
        .agg(F.count(F.lit(1)).alias("d_events"))
    )
    days = glob.select(
        F.explode(
            F.sequence(F.col("__mind"), F.col("__maxd"))
        ).alias("d")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(deltas, "d", "left")
        .join(deaths, "d", "left")
        .select(
            "d",
            F.sum(F.coalesce("net", F.lit(0))).over(w).alias("n_risk"),
            F.coalesce("d_events", F.lit(0)).alias("d_events"),
        )
        .select(
            F.date_add(
                F.to_date(F.lit("1970-01-01")), F.col("d").cast("int")
            ).alias("day"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d_events").cast("long").alias("d_events"),
            F.when(
                F.col("n_risk") > 0,
                F.col("d_events").cast("double")
                / F.col("n_risk").cast("double"),
            ).alias("hazard"),
        )
    )
