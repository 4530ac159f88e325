"""The ordered cleaning rule cascade (reference calculate.py:293-352).

The rules are masked updates applied *sequentially* — later rules read
earlier rules' writes (e.g. ``p > 100 → NULL`` must run before
``p IS NULL → z := NULL`` and ``p == 100 → z := 0``), so the order here
is literal.  Each rule is a ``when/otherwise`` projection; Catalyst
collapses the chain into a single stage, so the whole cascade costs one
pass with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _null():
    return F.lit(None).cast("double")


def _mask(df: DataFrame, cond: Column, cols: dict[str, Column]) -> DataFrame:
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

    # negative values are invalid → NULL
    for col in ["c", "e", "m", "p", "z"]:
        df = _mask(df, F.col(col) < 0, {col: _null()})

    # p must be ≤ 100
    df = _mask(df, F.col("p") > 100, {"p": _null()})
    # p NULL → z NULL
    df = _mask(df, F.col("p").isNull(), {"z": _null()})
    # p == 100 → z = 0
    df = _mask(df, F.col("p") == 100, {"z": F.lit(0.0)})

    # borough/city base variables: NULL c/m → 0 (controlled totals)
    boro_city_base = geo.isin("borough", "city") & pff.isin(base_variables)
    df = _mask(df, boro_city_base & F.col("c").isNull(), {"c": F.lit(0.0)})
    df = _mask(df, boro_city_base & F.col("m").isNull(), {"m": F.lit(0.0)})

    # base variables (except medians): p = 100, z = 0
    base_not_median = pff.isin(base_variables) & ~pff.isin(median_variables)
    df = _mask(df, base_not_median, {"p": F.lit(100.0), "z": F.lit(0.0)})

    # median-input bins are suppressed except *rms* variables
    if median_inputs:
        df = _mask(
            df,
            pff.isin(median_inputs) & ~pff.contains("rms"),
            {"c": _null(), "m": _null(), "p": _null(), "z": _null()},
        )

    # special variables never publish p/z
    if special_variables:
        df = _mask(df, pff.isin(special_variables), {"p": _null(), "z": _null()})

    # e == 0 or NULL → everything else NULL
    df = _mask(
        df,
        (F.col("e") == 0) | F.col("e").isNull(),
        {"c": _null(), "m": _null(), "p": _null(), "z": _null()},
    )

    return df
