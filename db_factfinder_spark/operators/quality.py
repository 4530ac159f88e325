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

from pyspark.sql import Column, DataFrame
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


def observed(df, name: str, metrics: dict[str, Column]):
    """Attach Spark's native observation metrics to a frame: the named
    aggregates are computed ON THE SAME PASS as whatever action runs
    the frame (CollectMetricsExec — no second scan, unlike running a
    separate audit agg), and read back from the returned
    ``Observation`` after the action.

    This is how a 100 TB pipeline gets row counts / null rates /
    checksum totals for free while writing its output: profiling with
    ``profile_columns`` costs an extra scan; ``observed`` costs
    nothing.  Metrics must be aggregates Spark allows in observations
    (no distinct); returns ``(df, observation)``."""
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
    return out, obs
