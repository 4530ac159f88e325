"""Bucketed-table layout: pre-partition fact tables by their join key
so repeated fact↔fact joins read co-partitioned scans with NO shuffle.

This is the Spark answer to the reference's implicit "one big merge per
query" (pandas hash-merge, factfinder/download.py:113-121 scale-up):
at 100 TB you cannot shuffle the fact table for every join, so you pay
the hash-partitioning once at write time (`bucketBy` + `sortBy`), and
every subsequent equi-join on the bucket key plans as a zero-exchange
sort-merge over aligned buckets.  test_plans asserts the no-Exchange
property on the actual physical plan.

Bucket-count guidance at scale: buckets ≈ (table size / target
partition size); both sides of a co-located join must use the same
bucket count and key.  AQE cannot coalesce bucketed scans, so avoid
over-bucketing small dimensions — broadcast those instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_DATABASE = "ff_buckets"


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    database: str = DEFAULT_DATABASE,
) -> DataFrame:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) on ``key``;
    returns the re-read catalog table whose scan carries the bucket
    layout.  Overwrites any previous version, so callers are
    re-runnable."""
    spark = df.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    # A managed-table LOCATION can survive a catalog reset (fresh derby
    # metastore, old warehouse dir) — then saveAsTable(overwrite) fails
    # with LOCATION_ALREADY_EXISTS because the catalog doesn't know the
    # table it would overwrite.  Drop both the entry and the location.
    spark.sql(f"DROP TABLE IF EXISTS {database}.{table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = spark._jvm.org.apache.hadoop.fs.Path(
        f"{warehouse}/{database}.db/{table}"
    )
    fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(f"{database}.{table}")
    )
    return spark.table(f"{database}.{table}")


def bucketed_equi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys.  The
    merge hint pins sort-merge (bucketed scans join shuffle-free and
    pre-sorted; a broadcast pick would waste the layout and AQE may
    otherwise choose it for small inputs)."""
    return left.join(
        right.hint("merge"), left[left_key] == right[right_key], how
    )
