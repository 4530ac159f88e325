"""As-of (backward point-in-time) join — an operator Spark has no
native form for, composed from existing DataFrame ops.

``asof_join(probes, quotes)`` attaches to every probe row the quote
value with the greatest ``on`` ≤ the probe's ``on`` within the same
``by`` key (DuckDB/pandas ``merge_asof`` backward semantics, quotes at
the exact probe timestamp included).

Plan shape — the scalable union-window form, NOT a range join: probe
and quote rows union into one frame, one shuffle partitions it by the
``by`` key, and a running ``last(value, ignorenulls)`` over the
(ts, probe-after-quote) order carries each quote forward to the probe
rows that follow it.  A naive inequality join explodes to O(probes ×
quotes-per-key) intermediate rows and forces a range-join strategy;
the window form is linear in rows and sorts once.  Skewed ``by`` keys
concentrate a window partition exactly like any keyed shuffle — salt
upstream if one key dominates.

Quotes sharing a (by, on) pair are ambiguous under as-of semantics;
callers should pre-aggregate duplicates (e.g. ``groupBy(by, on).max``)
— the operator itself is deterministic only when (by, on) is unique on
the quote side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    quotes: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_col: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: probe columns + ``{value_col}_asof`` (the
    latest quote value at-or-before the probe's ``on`` per ``by``
    key; NULL when no quote precedes)."""
    out_col = out_col or f"{value_col}_asof"
    probe_cols = probes.columns
    vtype = quotes.schema[value_col].dataType
    # the carried payload is a STRUCT, not the raw value: a quote whose
    # value is legitimately NULL must still win the as-of match (DuckDB
    # ASOF JOIN returns its NULL), so presence is encoded by the struct
    # being non-NULL while the value inside may be NULL —
    # last(ignorenulls) then skips probe rows but never a real quote
    p = probes.withColumns(
        {
            "__is_probe": F.lit(1),
            "__v": F.lit(None).cast(f"struct<v:{vtype.simpleString()}>"),
        }
    )
    q = quotes.select(
        F.col(by),
        F.col(on),
        F.struct(F.col(value_col).alias("v")).alias("__v"),
        F.lit(0).alias("__is_probe"),
    )
    u = p.unionByName(q, allowMissingColumns=True)
    # quotes sort before probes at equal ts → the >= (inclusive) match
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__v", ignorenulls=True).over(w)
    return (
        u.withColumn("__asof", carried)
        .filter(F.col("__is_probe") == 1)
        .select(*probe_cols, F.col("__asof")["v"].alias(out_col))
    )
