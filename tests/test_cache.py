"""CheckpointCache (S4): durable Parquet memoization keyed like the
reference's pickle caches (download.py:158-167, calculate.py:49-58)."""

import pyspark.sql.functions as F

from db_factfinder_spark.sources.cache import CheckpointCache


def test_cache_miss_computes_and_hit_skips(spark, tmp_path):
    calls = []

    def compute():
        calls.append(1)
        return spark.range(5).select(
            F.col("id").cast("string").alias("census_geoid"),
            (F.col("id") * 10.0).alias("e"),
        )

    cache = CheckpointCache(spark, tmp_path)
    out1 = cache.get_or_compute("calculate", 2019, "2010_to_2020", "NTA", "v1", compute)
    assert out1.count() == 5 and calls == [1]

    # hit: compute() must not run again; result is identical
    out2 = cache.get_or_compute("calculate", 2019, "2010_to_2020", "NTA", "v1", compute)
    assert calls == [1]
    assert sorted(r["e"] for r in out2.collect()) == [0.0, 10.0, 20.0, 30.0, 40.0]

    # distinct key → distinct entry
    cache.get_or_compute("calculate", 2019, "2010_to_2020", "tract", "v1", compute)
    assert calls == [1, 1]
    assert (tmp_path / "calculate" / "year=2019" / "geography=2010_to_2020"
            / "geotype=NTA" / "v1" / "_SUCCESS").exists()


def test_cache_disabled_passthrough(spark):
    cache = CheckpointCache(spark, None)
    out = cache.get_or_compute(
        "calculate", 2019, "g", "NTA", "v1", lambda: spark.range(3)
    )
    assert out.count() == 3


def test_cached_frame_cuts_lineage(spark, tmp_path):
    """The re-read frame must scan Parquet (partition-prunable,
    restart-safe), not re-execute the original lineage."""
    cache = CheckpointCache(spark, tmp_path)
    out = cache.get_or_compute(
        "download", 2019, "g", "city", "v2",
        lambda: spark.range(10).withColumn("e", F.col("id") * 2.0),
    )
    plan = out._jdf.queryExecution().toString()
    assert "parquet" in plan.lower()
    assert "Range" not in plan
