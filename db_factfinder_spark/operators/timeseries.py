"""Time-series regularization: gap filling + forward fill.

Sensor/event feeds are irregular; downstream models want one row per
(key, calendar bucket) with explicit zeros for silent buckets and the
last observation carried forward.  The reference has no time-series
surface (SURVEY.md §1.2: no timestamp types); this is part of the
extension surface for event analytics.

Scale shape: per-key day spans come from one groupBy; the calendar is
generated WITH `sequence()` *inside* each key's row (no calendar
cross-join, no driver loop), exploded, then left-joined back to the
observed buckets — both sides hash-partitioned by (key, bucket).  The
forward-fill window sorts only each key's own buckets (span-bounded,
not corpus-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per (key, day) between each key's first and last active
    day: ``n_events`` (0 on gap days), ``day_max`` (that day's max
    value, NULL on gaps), ``ff_value`` (last non-NULL day_max carried
    forward — never NULL because day one is an active day)."""
    daily = df.groupBy(
        F.col(key_col).alias("key"),
        F.to_date(ts_col).alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(value_col).alias("day_max"),
    )
    span = daily.groupBy("key").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = span.select(
        "key",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    filled = calendar.join(daily, ["key", "day"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        F.col("key").alias(key_col),
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "day_max",
        F.last("day_max", ignorenulls=True).over(w).alias("ff_value"),
    )
