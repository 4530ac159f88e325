"""Event-stream operators: windowed aggregation and sessionization.

The reference is batch-only (SURVEY §2.8); these extend the engine to
the streaming shapes a production deployment needs.  Each operator has
a *batch* form (same expressions, runs on a static frame — used by the
correctness oracle) and a *streaming* form (readStream → watermark →
windowed agg) that shares the aggregation logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts/sums per event type (batch form).
    One shuffle on (window, type)."""
    return (
        events.groupBy(F.window(ts_col, window_duration).alias("w"), type_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            type_col,
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    path: str,
    schema,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming form: parquet source → watermark (late-data bound,
    required for state cleanup) → tumbling windowed agg.  Returns the
    unstarted streaming DataFrame; callers pick the sink/trigger."""
    events = spark.readStream.schema(schema).parquet(path)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic gap-based sessionization (batch): lag + cumulative sum of
    gap-breaks over a per-user window.  Two window passes over one
    shuffle on user_id.  (Streaming equivalent:
    ``session_window(ts, gap)`` in a streaming groupBy.)"""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col))
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_id = events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_id.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
