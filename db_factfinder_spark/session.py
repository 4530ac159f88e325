"""SparkSession factory tuned for this engine.

Local mode is a single JVM; on a real cluster the same settings hold
except ``spark.driver.memory`` (use executor memory knobs there) and
shuffle partitions (size to ~2-3x total cores, or let AQE coalesce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def resolve_shuffle_partitions(
    cpus: int, shuffle_partitions: int | None, scale_profile: str
) -> int:
    """Initial shuffle-partition count for a profile (see get_spark);
    an explicit ``shuffle_partitions`` always wins."""
    if scale_profile not in ("local", "cluster"):
        raise ValueError(
            f"scale_profile must be 'local' or 'cluster', got {scale_profile!r}"
        )
    if shuffle_partitions is not None:
        return shuffle_partitions
    return cpus if scale_profile == "local" else 3 * cpus


def get_spark(
    app_name: str = "db_factfinder_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    scale_profile: str = "local",
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    AQE is on so runtime stats can re-plan joins (broadcast conversion,
    skew splitting, partition coalescing) — the behaviors that matter at
    100 TB where compile-time stats are wrong.

    ``scale_profile`` sizes the initial shuffle-partition count:

    - ``"local"`` (default): partitions == cores.  Right for a single
      JVM where every extra partition is pure scheduling overhead.
    - ``"cluster"``: partitions == 3x cores.  A 100 TB deployment wants
      the initial count well above total cores so no single shuffle
      partition exceeds executor memory; AQE coalesce then merges the
      small ones back at runtime (over-partitioning is cheap with AQE,
      under-partitioning OOMs).

    An explicit ``shuffle_partitions`` overrides the profile.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    shuffle_partitions = resolve_shuffle_partitions(
        cpus, shuffle_partitions, scale_profile
    )

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
