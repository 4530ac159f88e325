"""FIFO lot allocation (cost of goods sold) as a set-based plan.

The textbook imperative problem — each sale consumes the oldest
remaining purchase lots; report every sale's cost — becomes pure
relational algebra on the *cumulative-quantity axis*: lot *i* owns the
half-open quantity interval ``(cumB_{i-1}, cumB_i]`` and sale *j*
consumes ``(cumS_{j-1}, cumS_j]``, so the units sale *j* takes from lot
*i* are exactly the overlap ``min(cumB_i, cumS_j) −
max(cumB_{i-1}, cumS_{j-1})`` when positive.  No loop, no state: two
cumulative windows and one keyed join reproduce the sequential FIFO
semantics bit-for-bit, because the cumulative axis *is* the queue.

All quantities and unit costs are exact int64, so COGS is an exact
integer and the result is partition-invariant.

Scale shape: one window pass per side (partitioned by key), then an
equi-join ON the key with the strict overlap predicate — lots and
sells for one SKU/account meet in one shuffle partition.  Per-key
volumes are bounded by business reality (lots per SKU), and AQE's
skew-join split covers hot keys; if a single key ever held millions of
lots the cumulative axis itself is bucketable exactly like the spatial
grid join (operators/spatial.py) since both sides' intervals live on
the same integer line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fifo_allocate", "fifo_open_lots"]


def fifo_allocate(
    lots: DataFrame,
    sells: DataFrame,
    key_col: str = "key",
    seq_col: str = "seq",
    qty_col: str = "qty",
    cost_col: str = "cost",
) -> DataFrame:
    """Per-sale FIFO fill: ``{key}, sell_seq, sell_qty, qty_filled,
    cogs``.

    ``lots``: ``key, seq, qty, cost`` (unit cost, integer); ``sells``:
    ``key, seq, qty``.  ``seq`` totally orders each side within a key
    (FIFO order).  ``qty_filled < sell_qty`` means the sale outran the
    available lots (the unfilled tail matches nothing — callers decide
    whether that is an error).
    """
    wk = Window.partitionBy("k").orderBy("lot_seq")
    l = (
        lots.select(
            F.col(key_col).alias("k"),
            F.col(seq_col).alias("lot_seq"),
            F.col(qty_col).cast("long").alias("lot_qty"),
            F.col(cost_col).cast("long").alias("cost"),
        )
        .withColumn("cb", F.sum("lot_qty").over(wk))
        .withColumn("cb0", F.col("cb") - F.col("lot_qty"))
    )
    ws = Window.partitionBy("k").orderBy("sell_seq")
    s = (
        sells.select(
            F.col(key_col).alias("k"),
            F.col(seq_col).alias("sell_seq"),
            F.col(qty_col).cast("long").alias("sell_qty"),
        )
        .withColumn("cs", F.sum("sell_qty").over(ws))
        .withColumn("cs0", F.col("cs") - F.col("sell_qty"))
    )
    matched = F.least(F.col("cb"), F.col("cs")) - F.greatest(
        F.col("cb0"), F.col("cs0")
    )
    pairs = l.join(s, "k").filter(
        (F.col("cb0") < F.col("cs")) & (F.col("cs0") < F.col("cb"))
    )
    return (
        pairs.groupBy("k", "sell_seq", "sell_qty")
        .agg(
            F.sum(matched).alias("qty_filled"),
            F.sum(matched * F.col("cost")).alias("cogs"),
        )
        .select(
            F.col("k").alias(key_col),
            "sell_seq",
            "sell_qty",
            "qty_filled",
            "cogs",
        )
    )


def fifo_open_lots(
    lots: DataFrame,
    sells: DataFrame,
    key_col: str = "key",
    seq_col: str = "seq",
    qty_col: str = "qty",
    cost_col: str = "cost",
) -> DataFrame:
    """The balance-sheet side of :func:`fifo_allocate`: what remains
    on the shelf, per lot, after FIFO consumption.

    On the cumulative axis the total sold ``S`` is a single waterline:
    lot *i* (interval ``(cb0, cb]``) has ``remaining = cb −
    max(S, cb0)`` clamped at ≥ 0 — fully consumed lots hit 0, at most
    one lot is partial, newer lots are untouched.  Remaining value =
    remaining · unit cost, exact int64.  This is the inventory-aging
    input: group the output by lot age to get the aging report.

    One window pass over lots + one keyed aggregate of sells (no
    pairwise join at all — the waterline replaces it).  Returns
    ``{key_col}, {seq_col}, lot_qty, remaining, remaining_value``.
    """
    wk = Window.partitionBy("k").orderBy("lot_seq")
    l = (
        lots.select(
            F.col(key_col).alias("k"),
            F.col(seq_col).alias("lot_seq"),
            F.col(qty_col).cast("long").alias("lot_qty"),
            F.col(cost_col).cast("long").alias("cost"),
        )
        .withColumn("cb", F.sum("lot_qty").over(wk))
        .withColumn("cb0", F.col("cb") - F.col("lot_qty"))
    )
    s = sells.groupBy(F.col(key_col).alias("k")).agg(
        F.sum(F.col(qty_col).cast("long")).alias("S")
    )
    rem = F.greatest(
        F.lit(0).cast("long"),
        F.col("cb") - F.greatest(F.coalesce("S", F.lit(0)), F.col("cb0")),
    )
    return (
        l.join(s, "k", "left")
        .select(
            F.col("k").alias(key_col),
            F.col("lot_seq").alias(seq_col),
            "lot_qty",
            rem.alias("remaining"),
            (rem * F.col("cost")).alias("remaining_value"),
        )
    )
