"""Data-quality audit operators: constraint validation and column
profiling.

The checks a warehouse load runs before publishing a table — foreign-
key orphans, null rates, cardinalities — expressed as single-pass
Spark plans.  At 100 TB the shapes that matter: FK validation is a
LEFT ANTI join (broadcast when the parent's key set fits, which a
dimension's always does); profiling is ONE aggregate over the scan
(count/null-count per column are plain conditional counts; distinct
counts share the pass via Expand), never one job per column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
) -> DataFrame:
    """Rows of ``child`` whose ``fk`` has no match in ``parent.pk``
    (NULL fks are orphans too — a NULL never satisfies the
    constraint).  LEFT ANTI join; broadcast the parent key set."""
    keys = F.broadcast(parent.select(F.col(pk).alias(fk)).distinct())
    return child.join(keys, [fk], "left_anti")


def profile_columns(
    df: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """One-pass profile: per requested column a row of
    ``(col_name, n_rows, n_null, n_distinct)`` — the publish-gate
    sanity report.  All counts come from ONE aggregate (distincts
    share the pass through Catalyst's Expand rewrite); the long
    single-row result unpivots to one row per column map-side."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"dist_{c}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"null_{c}").alias("n_null"),
                F.col(f"dist_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
