"""Cascaded rollup: each level must equal direct aggregation from raw,
and the cascade must scan raw exactly once."""

from pyspark.sql import functions as F

from db_factfinder_spark.operators.rollup_cascade import (
    base_rollup,
    cascaded_rollup,
)
from db_factfinder_spark.sources.readers import read_events

import os

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def _events(spark):
    ev = read_events(spark, f"{SF}/events.parquet")
    return ev.withColumn("value", F.col("value").cast("decimal(18,2)"))


def test_cascade_levels_match_direct(spark):
    ev = _events(spark)
    levels = cascaded_rollup(ev, ["minute", "hour", "day"])
    for grain in ("hour", "day"):
        direct = base_rollup(ev, grain)
        cascade = levels[grain]
        d = {(r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"],
                                              r["min_value"], r["max_value"])
             for r in direct.collect()}
        c = {(r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"],
                                              r["min_value"], r["max_value"])
             for r in cascade.collect()}
        assert d == c, f"{grain} cascade diverges from direct"
    assert len(levels) == 3


def test_cascade_scans_raw_once(spark):
    ev = _events(spark)
    daily = cascaded_rollup(ev, ["minute", "hour", "day"])["day"]
    plan = daily._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, "coarse level re-scanned raw"
