"""SCD Type-2 history build — change-log → validity intervals.

``scd2_intervals(df, ...)`` turns a row-per-observation change log
into slowly-changing-dimension type-2 history: per key, consecutive
rows with the same tracked attribute collapse into one interval with
``valid_from`` / ``valid_to`` (NULL ``valid_to`` = current) and the
number of observations backing it.

Plan shape: the change detection (``lag`` ≠ current, null-safe) and
the running segment id (cumulative sum of change flags) share ONE
window sort on (key, order); the interval roll-up is then a groupBy
on (key, segment) — same leading key, so the rows for one entity stay
on one executor — and the ``valid_to`` chaining is a ``lead`` window
over the (already tiny) interval rows.  Raw rows are touched once.

At 100 TB this is the standard event-sourcing compaction: everything
partitions by the entity key, no join against the raw table, and the
output is proportional to the number of *changes*, not observations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key: str,
    order_by: Sequence[str],
    attr: str,
) -> DataFrame:
    """Collapse per-``key`` runs of identical ``attr`` (in ``order_by``
    order) into intervals.

    Returns one row per run: ``key, attr, valid_from, valid_to,
    n_obs`` where ``valid_from`` is the first ``order_by[0]`` of the
    run, ``valid_to`` the next run's ``valid_from`` (NULL for the
    current run) and ``n_obs`` the number of source rows collapsed.
    """
    ts = order_by[0]
    w_row = Window.partitionBy(key).orderBy(*order_by)
    # null-safe "changed" flag; the first row of a key always starts a
    # segment (lag is NULL and eqNullSafe(NULL) is false unless attr
    # is NULL too — guard with the explicit lag-is-null check)
    prev = F.lag(F.col(attr)).over(w_row)
    prev_seen = F.lag(F.lit(1)).over(w_row)
    changed = F.when(prev_seen.isNull(), F.lit(1)).otherwise(
        (~F.col(attr).eqNullSafe(prev)).cast("int")
    )
    seg = F.sum(changed).over(
        w_row.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    segmented = df.select(
        F.col(key), F.col(attr), F.col(ts).alias("__ts"), seg.alias("__seg")
    )
    runs = segmented.groupBy(key, "__seg", attr).agg(
        F.min("__ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    w_seg = Window.partitionBy(key).orderBy("__seg")
    return runs.select(
        F.col(key),
        F.col(attr),
        F.col("valid_from"),
        F.lead("valid_from").over(w_seg).alias("valid_to"),
        F.col("n_obs"),
    )


def bitemporal_asof(
    log: DataFrame,
    key_col: str,
    valid_col: str,
    tx_col: str,
    as_of_valid,
    as_of_tx,
) -> DataFrame:
    """Bitemporal point lookup over a correction-carrying change log:
    per key, the row that was VALID at ``as_of_valid`` *as the system
    knew it* at ``as_of_tx`` — the "what did we believe on date K
    about date V" query that restatements, backfills and late
    corrections force on every warehouse (the transaction dimension
    scd2_intervals deliberately does not model).

    Winner = among rows with ``valid <= as_of_valid`` and
    ``tx <= as_of_tx``, the max (valid, tx) — newest effective state,
    then newest correction of it.  One filtered window with a rank-1
    row_number: Spark 4 plans it as WindowGroupLimit, so each
    partition keeps one candidate per key map-side and the shuffle
    carries winners, not history.  Keys with no qualifying row are
    absent (the caller left-joins if presence is required).
    """
    f = log.filter(
        (F.col(valid_col) <= as_of_valid) & (F.col(tx_col) <= as_of_tx)
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(valid_col).desc(), F.col(tx_col).desc()
    )
    return (
        f.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def retention_sweep(
    df: DataFrame,
    key_col: str,
    version_col: str,
    bytes_col: str,
    keep_last: int,
    keep_from: int,
) -> DataFrame:
    """Version-retention (vacuum) planner over a versioned table.

    The lakehouse GC policy — keep each key's last ``keep_last``
    versions plus every version at or after ``keep_from`` (time-travel
    horizon) — evaluated as a *report before the delete*: per key,
    how many versions and bytes are reclaimable vs retained.  Exactly
    the dry-run a storage-ops reviewer signs off on before the sweep
    mutates anything (the delete itself is ``sources.targeted_delete``
    territory).

    One window pass (rank per key by version desc) + one aggregate;
    ``version_col``/``bytes_col`` are exact integers.

    Returns ``{key_col}, n_versions, n_keep, n_reclaim,
    bytes_keep, bytes_reclaim``.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.desc("__v"), F.desc("__b")
    )
    flagged = df.select(
        key_col,
        F.col(version_col).cast("long").alias("__v"),
        F.col(bytes_col).cast("long").alias("__b"),
    ).withColumn(
        "__keep",
        (F.row_number().over(w) <= keep_last)
        | (F.col("__v") >= keep_from),
    )
    return flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.when(F.col("__keep"), 1).otherwise(0)).alias("n_keep"),
        F.sum(F.when(~F.col("__keep"), 1).otherwise(0)).alias(
            "n_reclaim"
        ),
        F.sum(F.when(F.col("__keep"), F.col("__b")).otherwise(0)).alias(
            "bytes_keep"
        ),
        F.sum(
            F.when(~F.col("__keep"), F.col("__b")).otherwise(0)
        ).alias("bytes_reclaim"),
    )
