"""CDC merge (upsert + delete) — last-writer-wins keyed merge.

``merge_upsert(base, updates, ...)`` folds a change-log into a base
snapshot: for every key the newest row wins (updates beat base at
equal version), and a winning row flagged as a tombstone deletes the
key from the output.  This is the Delta/Iceberg ``MERGE INTO`` /
Hudi upsert semantics expressed as one Spark plan.

Plan shape — ONE shuffle: base and updates union into a single frame
and a ``row_number`` window over the merge keys picks each key's
winner.  No join: a join-based merge (base LEFT JOIN updates) shuffles
both sides *and* needs a second pass for insert-only keys; the
union-window form handles insert/update/delete uniformly and touches
each row once.  At 100 TB the window partitions by the merge key
exactly like the join would, so skew behaviour is identical (AQE /
salting upstream applies); when the base table is already bucketed by
the key, ``sources.bucketing.write_bucketed`` makes the base side
shuffle-free and only the (much smaller) delta shuffles.

Determinism: callers must pass ``order_by`` columns that are unique
per key (e.g. a version/ts plus a change-id tiebreak); ties would
otherwise be broken by the union side (updates first), which is still
deterministic but rarely what you want.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    delete_flag: Column | None = None,
) -> DataFrame:
    """Merge ``updates`` into ``base``: per key, keep the row with the
    greatest ``order_by`` tuple (updates win ties vs base); if
    ``delete_flag`` (a boolean Column over the unioned schema)
    evaluates true on the winner, the key is dropped entirely.

    Returns the merged snapshot with ``base``'s columns.
    """
    out_cols = base.columns
    b = base.withColumn("__src", F.lit(0))
    u = updates.withColumn("__src", F.lit(1))
    unioned = b.unionByName(u, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_by], F.col("__src").desc()
    )
    winners = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    if delete_flag is not None:
        winners = winners.filter(~F.coalesce(delete_flag, F.lit(False)))
    return winners.select(*out_cols)


def golden_record(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    fields: list[str],
) -> DataFrame:
    """Master-data survivorship: collapse multi-source records for one
    entity into a single golden row, picking each field's most recent
    NON-NULL observation independently (so a newer record that left
    ``phone`` blank doesn't erase the older phone).  Returns one row
    per key: ``key, <fields...>, n_records``.

    Per-field winner = max over (field IS NOT NULL, ts, tiebreak,
    value) — a lexicographic struct max, so presence beats recency,
    recency beats the tiebreak, and the total order makes the result
    partition-invariant.  Every field resolves inside ONE hash
    aggregate on the entity key (struct max is algebraic: partials
    combine map-side), vs the row_number-per-field alternative which
    pays a window sort per field.  At 100 TB: one shuffle, period.
    """
    aggs = [
        F.max(
            F.struct(
                F.col(f).isNotNull().alias("p"),
                F.col(ts_col).alias("t"),
                F.col(tiebreak_col).alias("b"),
                F.col(f).alias("v"),
            )
        )["v"].alias(f)
        for f in fields
    ]
    return df.groupBy(key_col).agg(
        *aggs, F.count(F.lit(1)).alias("n_records")
    )
