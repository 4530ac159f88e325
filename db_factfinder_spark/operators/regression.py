"""Grouped closed-form linear regression (regr_slope/regr_intercept
semantics) with engine-portable exactness.

Native ``regr_slope`` accumulates floating-point co-moments whose
order differs per engine and per partitioning — fine for analytics,
useless for cross-engine reconciliation.  Here the five sufficient
statistics (n, Σx, Σy, Σxy, Σx²) are EXACT integers (inputs are
integer-coded: an epoch-second offset and a fixed-decimal unit value),
summed as decimals so no magnitude or ordering can perturb them, and
the closed form

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²sum)
    intercept = (Σy − slope·Σx) / n

is evaluated in a FIXED operation order on doubles, each operand a
correctly-rounded cast of an exact integer — so any engine produces
the bit-identical result.

Scale shape: one map-side-combined groupBy — the same cost as any
keyed aggregate; no second pass, no co-moment windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def grouped_linreg(
    df: DataFrame,
    keys: Sequence[str],
    x: Column,
    y_units: Column,
) -> DataFrame:
    """Per-key OLS slope/intercept of integer-coded (x, y) pairs.

    ``x`` and ``y_units`` must be exact integer expressions (callers
    code their measures: epoch-offset seconds, value·10^d units).
    Returns ``keys..., n, slope_u, intercept_u`` where the ``_u``
    outputs are in y-units per x-unit (undo the caller's coding by
    dividing once at the end — one more identical IEEE op).
    Degenerate groups (all x equal → zero variance) yield NULL slope.
    """
    # operands go to decimal BEFORE multiplying/summing: a long×long
    # product (or a long sum) would silently wrap for large codings,
    # exactly the magnitude failure this operator exists to avoid
    xd = x.cast("long").cast(_DEC)
    yd = y_units.cast("long").cast(_DEC)
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast(_DEC).alias("__n"),
        F.sum(xd).alias("__sx"),
        F.sum(yd).alias("__sy"),
        F.sum(xd * yd).alias("__sxy"),
        F.sum(xd * xd).alias("__sxx"),
    )
    num = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    den = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    slope = F.when(den != 0, num / den)
    intercept = (
        F.col("__sy").cast("double") - slope * F.col("__sx").cast("double")
    ) / F.col("__n").cast("double")
    return agg.select(
        *keys,
        F.col("__n").cast("long").alias("n"),
        slope.alias("slope_u"),
        intercept.alias("intercept_u"),
    )
