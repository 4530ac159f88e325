"""Hypertable-style cascaded time rollups (continuous aggregates).

A 100 TB event store can't re-scan raw data for every resolution: the
TimescaleDB/Druid pattern aggregates raw events once at the finest
grain, then derives every coarser level from the previous level's
partials.  For algebraic aggregates (count, sum, min, max) the
re-aggregation is exact: counts/sums add, min/min and max/max compose
— so the hourly table reads the minutely table (60× smaller than raw),
the daily reads the hourly (24× smaller again), and raw is scanned
exactly once.  Non-algebraic aggregates (median, distinct) need
sketches (not implemented here — q08's median and exact distinct work
at one grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def base_rollup(
    events: DataFrame,
    grain: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Raw events → finest-grain partial aggregates: one shuffle on
    (bucket, key).  ``grain`` is a ``date_trunc`` unit."""
    return (
        events.groupBy(
            F.date_trunc(grain, ts_col).alias("bucket"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def rollup_to(finer: DataFrame, grain: str, key_col: str = "event_type") -> DataFrame:
    """One cascade step: re-aggregate a finer level's partials to a
    coarser grain.  Reads the (already tiny) finer aggregate — never
    the raw events."""
    return (
        finer.groupBy(
            F.date_trunc(grain, "bucket").alias("bucket"), F.col(key_col)
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def cascaded_rollup(
    events: DataFrame,
    grains: list[str],
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> dict[str, DataFrame]:
    """Full cascade: ``grains`` ordered fine→coarse (e.g. ``["minute",
    "hour", "day"]``).  Returns {grain: aggregate}; level k's plan reads
    level k-1, so materializing the finest level (cache or a parquet
    write) makes every coarser level nearly free."""
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for g in grains:
        prev = (
            base_rollup(events, g, ts_col, key_col, value_col)
            if prev is None
            else rollup_to(prev, g, key_col)
        )
        out[g] = prev
    return out


def dimensional_rollup(
    df: DataFrame,
    dims: list[str],
    measures: dict[str, "F.Column"],
    all_label: str = "ALL",
) -> DataFrame:
    """Hierarchical subtotal cube via native ROLLUP — every prefix of
    ``dims`` gets a subtotal row plus the grand total, in ONE pass:
    Catalyst's Expand rewrite replicates each input row once per
    grouping set BEFORE the aggregation, so map-side partial
    aggregation still applies and the cost is (#sets)× map work with
    a single shuffle — not one job per subtotal level (the naive
    union-of-groupbys a reporting layer otherwise runs).

    Rolled-up dimension slots are COALESCED to ``all_label`` (never
    exposed as NULL): engines/readers disagree on NULL rendering, and
    a real NULL dimension value would be indistinguishable from a
    subtotal row.  ``level`` is the grouping bitmask (0 = finest,
    2^len(dims)−1 = grand total) computed from per-dim grouping()
    flags — portable across engines that number bits differently.

    Output: ``*dims, level, *measures``.
    """
    gid = None
    for d in dims:
        bit = F.grouping(d).cast("long")
        gid = bit if gid is None else gid * F.lit(2) + bit
    # grouping() is only legal INSIDE the rollup's agg clause — it
    # reads the grouping-set id the Expand rewrite synthesizes, which
    # no longer exists in a downstream Project
    return (
        df.rollup(*dims)
        .agg(
            gid.alias("level"),
            *[m.alias(name) for name, m in measures.items()],
        )
        .select(
            *[
                F.coalesce(F.col(d).cast("string"), F.lit(all_label)).alias(d)
                for d in dims
            ],
            "level",
            *measures.keys(),
        )
    )
