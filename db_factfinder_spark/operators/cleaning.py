"""The ordered cleaning rule cascade (reference calculate.py:293-352).

The rules are masked updates applied *sequentially* — later rules read
earlier rules' writes (e.g. ``p > 100 → NULL`` must run before
``p IS NULL → z := NULL`` and ``p == 100 → z := 0``), so the order here
is literal.

The cascade composes PYTHON-side into one projection: each rule
rewrites the per-column expression as ``when(cond, value)
.otherwise(previous)`` where ``cond`` is built from the *current*
(already-masked) expressions — exactly the sequential read-your-writes
semantics — and the frame is touched once at the end.  A chain of 14
``withColumns`` calls is value-identical but pays Catalyst analysis of
the whole upstream plan per call (~4 s at full-catalog width,
measured); the composed form pays it once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _null():
    return F.lit(None).cast("double")


def _mask(df: DataFrame, cond: Column, cols: dict[str, Column]) -> DataFrame:
    """One masked update as a standalone frame transform (kept for
    callers outside the cascade, e.g. the conditional-update operator
    parity tests)."""
    return df.withColumns(
        {name: F.when(cond, value).otherwise(F.col(name)) for name, value in cols.items()}
    )


def cleaning(
    df: DataFrame,
    base_variables: list[str],
    median_variables: list[str],
    special_variables: list[str],
    median_inputs: list[str],
) -> DataFrame:
    """Apply the cascade in reference order (calculate.py:293-352)."""
    pff = F.col("pff_variable")
    geo = F.col("geotype")

    cur: dict[str, Column] = {c: F.col(c) for c in ("c", "e", "m", "p", "z")}

    def mask(cond: Column, cols: dict[str, Column]) -> None:
        # snapshot semantics: cond and values were built from the
        # CURRENT expressions, so later rules see earlier rules' writes
        for name, value in cols.items():
            cur[name] = F.when(cond, value).otherwise(cur[name])

    # negative values are invalid → NULL
    for col in ["c", "e", "m", "p", "z"]:
        mask(cur[col] < 0, {col: _null()})

    # p must be ≤ 100
    mask(cur["p"] > 100, {"p": _null()})
    # p NULL → z NULL
    mask(cur["p"].isNull(), {"z": _null()})
    # p == 100 → z = 0
    mask(cur["p"] == 100, {"z": F.lit(0.0)})

    # borough/city base variables: NULL c/m → 0 (controlled totals)
    boro_city_base = geo.isin("borough", "city") & pff.isin(base_variables)
    mask(boro_city_base & cur["c"].isNull(), {"c": F.lit(0.0)})
    mask(boro_city_base & cur["m"].isNull(), {"m": F.lit(0.0)})

    # base variables (except medians): p = 100, z = 0
    base_not_median = pff.isin(base_variables) & ~pff.isin(median_variables)
    mask(base_not_median, {"p": F.lit(100.0), "z": F.lit(0.0)})

    # median-input bins are suppressed except *rms* variables
    if median_inputs:
        mask(
            pff.isin(median_inputs) & ~pff.contains("rms"),
            {"c": _null(), "m": _null(), "p": _null(), "z": _null()},
        )

    # special variables never publish p/z
    if special_variables:
        mask(pff.isin(special_variables), {"p": _null(), "z": _null()})

    # e == 0 or NULL → everything else NULL
    mask(
        (cur["e"] == 0) | cur["e"].isNull(),
        {"c": _null(), "m": _null(), "p": _null(), "z": _null()},
    )

    return df.withColumns(cur)
