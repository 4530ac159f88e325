"""Horizontal aggregation: many census columns → one derived variable.

Reference calculate.py:92-107: ``e = Σ E_cols`` (NaN-skipping),
``m = sqrt(Σ M_col²)`` for ACS, NULL for decennial.  A purely row-local
projection — no shuffle, stays inside whole-stage codegen, and Catalyst
prunes the scan down to exactly the E/M columns used (check
``.explain``'s ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_factfinder_spark.catalog import Variable
from db_factfinder_spark.functions.stats import hmoe, hsum

FACT_EM = ["census_geoid", "pff_variable", "geotype", "e", "m"]


def aggregate_horizontal(
    df: DataFrame, v: Variable, source: str = "acs"
) -> DataFrame:
    """Wide source frame → long ``(census_geoid, pff_variable, geotype,
    e, m)`` for one variable.  Decennial sources carry no margins, so
    ``m`` is NULL (calculate.py:101-105)."""
    e_cols, m_cols, _, _ = v.census_variables
    e = hsum(e_cols)
    m = (
        hmoe(m_cols)
        if source != "decennial"
        else F.lit(None).cast("double")
    )
    return df.select(
        "census_geoid",
        F.lit(v.pff_variable).alias("pff_variable"),
        "geotype",
        e.alias("e"),
        m.alias("m"),
    )
