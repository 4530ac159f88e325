"""As-of join semantics: backward inclusive match per key."""

from pyspark.sql import functions as F

from db_factfinder_spark.operators.asof import asof_join


def _frames(spark):
    probes = spark.createDataFrame(
        [(1, 10, "u1"), (2, 20, "u1"), (3, 5, "u1"), (4, 15, "u2"),
         (5, 30, "u3")],
        "event_id long, ts long, user_id string",
    )
    quotes = spark.createDataFrame(
        [("u1", 10, 1.5), ("u1", 18, 2.5), ("u2", 15, 7.0), ("u2", 16, 8.0)],
        "user_id string, ts long, value double",
    )
    return probes, quotes


def test_asof_backward_inclusive(spark):
    probes, quotes = _frames(spark)
    out = {r["event_id"]: r["value_asof"] for r in
           asof_join(probes, quotes, on="ts", by="user_id").collect()}
    assert out[1] == 1.5   # quote at the exact probe ts matches (>=)
    assert out[2] == 2.5   # latest prior quote (18 < 20), not the first
    assert out[3] is None  # no quote at-or-before ts=5
    assert out[4] == 7.0   # u2: quote@15 matches, quote@16 is after
    assert out[5] is None  # u3 has no quotes at all


def test_asof_preserves_probe_columns_and_rows(spark):
    probes, quotes = _frames(spark)
    out = asof_join(probes, quotes, on="ts", by="user_id")
    assert out.columns == ["event_id", "ts", "user_id", "value_asof"]
    assert out.count() == probes.count()
