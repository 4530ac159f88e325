"""Zone-map (min/max data-skipping) statistics and prune audit.

Columnar lakehouse scans skip whole files/row-groups when the
predicate can't be satisfied by the unit's min/max stats — the
mechanism behind parquet row-group skipping, Delta/Iceberg file
pruning, and the reason time-partitioned layouts answer time
predicates by reading ~0% of the data.  This operator computes those
stats per logical bucket and audits which buckets a given predicate
would let the scan SKIP — making the layout-vs-predicate interaction
measurable before anyone pays for the full scan.

The demo pairs a clustered column (the bucket key itself — every
bucket's min/max span is narrow, so range predicates prune hard) with
an unclustered column (values spread uniformly per bucket, min/max
spans everything, nothing prunes).  That contrast is the entire
argument for Z-ordering (``sources/layout.py``): re-clustering turns
the second column into the first.

One partial-aggregated groupBy; stats are O(buckets), integer-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zone_map_stats"]


def zone_map_stats(
    df: DataFrame,
    bucket: Column,
    stat_cols: dict[str, Column],
    prune_predicates: dict[str, tuple[str, str, int]],
) -> DataFrame:
    """Per-bucket min/max zone maps + skip flags.

    ``stat_cols`` maps stat name → integral column expression; the
    output carries ``min_<name>`` / ``max_<name>`` per bucket.
    ``prune_predicates`` maps flag name → (stat_name, op, literal)
    with op in {">", ">=", "<", "<="}: the flag is True when NO row in
    the bucket can satisfy ``stat op literal`` — i.e. a scan for that
    predicate skips the bucket entirely (the parquet row-group rule:
    ``>`` prunes when max <= literal, ``<`` when min >= literal).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, col in stat_cols.items():
        aggs.append(F.min(col).alias(f"min_{name}"))
        aggs.append(F.max(col).alias(f"max_{name}"))
    out = df.groupBy(bucket.alias("bucket")).agg(*aggs)

    for flag, (stat, op, lit) in prune_predicates.items():
        lo, hi = F.col(f"min_{stat}"), F.col(f"max_{stat}")
        if op == ">":
            cond = hi <= F.lit(lit)
        elif op == ">=":
            cond = hi < F.lit(lit)
        elif op == "<":
            cond = lo >= F.lit(lit)
        elif op == "<=":
            cond = lo > F.lit(lit)
        else:
            raise ValueError(f"unsupported op {op!r}")
        out = out.withColumn(flag, cond)
    return out
