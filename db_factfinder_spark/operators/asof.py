"""As-of (point-in-time) join — an operator Spark has no native form
for, composed from existing DataFrame ops.

``asof_join(probes, quotes)`` attaches to every probe row the quote
value at the greatest ``on`` ≤ the probe's ``on`` within the same
``by`` key (DuckDB/pandas ``merge_asof`` backward semantics, quotes at
the exact probe timestamp included).  ``direction="forward"`` takes
the smallest ``on`` ≥ instead, ``"nearest"`` whichever side is closer
(ties to backward, the pandas rule), and ``tolerance`` invalidates
matches farther than the given gap — the full ``merge_asof`` surface.

Plan shape — the scalable union-window form, NOT a range join: probe
and quote rows union into one frame, one shuffle partitions it by the
``by`` key, and a running ``last(value, ignorenulls)`` over the
(ts, probe-after-quote) order carries each quote to the probe rows
that follow it (forward runs the same scan in descending order;
nearest runs both and picks per row — still two linear window passes
over ONE shuffled partitioning, never an inequality join).  A naive
inequality join explodes to O(probes × quotes-per-key) intermediate
rows and forces a range-join strategy; the window form is linear in
rows and sorts once per direction.  Skewed ``by`` keys concentrate a
window partition exactly like any keyed shuffle — salt upstream if
one key dominates.

Quotes sharing a (by, on) pair are ambiguous under as-of semantics;
callers should pre-aggregate duplicates (e.g. ``groupBy(by, on).max``)
— the operator itself is deterministic only when (by, on) is unique on
the quote side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _on_scalar(col: Column, dtype: str) -> Column:
    """``on`` as a comparable long for gap arithmetic: micros for
    timestamps, day number for dates, the value itself otherwise."""
    if dtype.startswith("timestamp"):
        return F.unix_micros(col)
    if dtype == "date":
        return F.datediff(col, F.lit("1970-01-01")).cast("long")
    return col.cast("long")


def asof_join(
    probes: DataFrame,
    quotes: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_col: str = "value",
    out_col: str | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join: probe columns + ``{value_col}_asof``.

    ``direction``: ``"backward"`` (latest quote at-or-before, the
    default and the pre-round-6 behavior), ``"forward"`` (earliest
    at-or-after), ``"nearest"`` (closer of the two; equal gaps take
    the backward match).  ``tolerance`` (in ``on`` units — micros for
    timestamps, days for dates) NULLs any match whose gap exceeds it.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    out_col = out_col or f"{value_col}_asof"
    probe_cols = probes.columns
    vtype = quotes.schema[value_col].dataType.simpleString()
    on_type = quotes.schema[on].dataType.simpleString()
    payload = f"struct<o:bigint,v:{vtype}>"
    p = probes.withColumns(
        {
            "__is_probe": F.lit(1),
            "__v": F.lit(None).cast(payload),
        }
    )
    q = quotes.select(
        F.col(by),
        F.col(on),
        F.struct(
            _on_scalar(F.col(on), on_type).alias("o"),
            F.col(value_col).alias("v"),
        ).alias("__v"),
        F.lit(0).alias("__is_probe"),
    )
    u = p.unionByName(q, allowMissingColumns=True)
    # quotes sort before probes at equal ts in BOTH scan directions →
    # the match is inclusive on each side
    w_back = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(by)
        .orderBy(F.col(on).desc(), F.col("__is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    probe_on = _on_scalar(F.col(on), on_type)

    def guarded(match: Column, gap: Column) -> Column:
        ok = match.isNotNull()
        if tolerance is not None:
            ok = ok & (gap <= F.lit(int(tolerance)))
        return F.when(ok, match)

    cols = {}
    if direction in ("backward", "nearest"):
        cols["__b"] = F.last("__v", ignorenulls=True).over(w_back)
    if direction in ("forward", "nearest"):
        cols["__f"] = F.last("__v", ignorenulls=True).over(w_fwd)
    carried = u.withColumns(cols).filter(F.col("__is_probe") == 1)
    if direction == "backward":
        pick = guarded(F.col("__b"), probe_on - F.col("__b")["o"])
    elif direction == "forward":
        pick = guarded(F.col("__f"), F.col("__f")["o"] - probe_on)
    else:
        b = guarded(F.col("__b"), probe_on - F.col("__b")["o"])
        f = guarded(F.col("__f"), F.col("__f")["o"] - probe_on)
        gap_b = probe_on - b["o"]
        gap_f = f["o"] - probe_on
        pick = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(gap_f < gap_b, f)
            .otherwise(b)  # ties → backward (pandas rule)
        )
    return carried.select(
        *probe_cols, pick["v"].alias(out_col)
    )
