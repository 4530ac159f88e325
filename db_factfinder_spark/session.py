"""SparkSession factory tuned for this engine.

Local mode is a single JVM; on a real cluster the same settings hold
except ``spark.driver.memory`` (use executor memory knobs there) and
shuffle partitions (size to ~2-3x total cores, or let AQE coalesce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "db_factfinder_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    AQE is on so runtime stats can re-plan joins (broadcast conversion,
    skew splitting, partition coalescing) — the behaviors that matter at
    100 TB where compile-time stats are wrong.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate adds `size(child)>0 AND isnotnull(child)`
        # above every explode.  When the exploded array is a computed
        # expression (shingles, LSH bands), predicate pushdown substitutes
        # the FULL expression into the filter and pushes it below
        # repartitions into the scan — re-running the expensive pipeline
        # once more, on the scan's raw parallelism (a single split for
        # small files).  The filter is semantically void for explode
        # (empty/NULL arrays emit no rows anyway), so drop the rule.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
