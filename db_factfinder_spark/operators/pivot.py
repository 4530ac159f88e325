"""Long→wide pivot feeding the median and special-variable math.

Reference calculate.py:147-149 and special.py:7-18 pivot the long fact
table on ``pff_variable``.  Spark's ``pivot`` gets the *explicit* value
list from the catalog (never inferred — inference would cost an extra
pass over the data and is order-unstable), so the plan is a single
shuffle on ``census_geoid``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_e_m(
    df: DataFrame,
    variables: list[str],
    e_suffix: str = "e",
    m_suffix: str = "m",
    include_m: bool = True,
) -> DataFrame:
    """Pivot long ``(census_geoid, pff_variable, e, m)`` to one row per
    geoid with ``{var}e`` / ``{var}m`` columns (special.py:7-18 naming).

    ``include_m=False`` gives the e-only pivot used by the median
    pipeline (calculate.py:147-149).
    """
    aggs = [F.first("e").alias("E")]
    if include_m:
        aggs.append(F.first("m").alias("M"))
    p = df.groupBy("census_geoid").pivot("pff_variable", variables).agg(*aggs)
    cols = [F.col("census_geoid")]
    for v in variables:
        # single-agg pivots drop the agg alias from the column name
        e_src = f"{v}_E" if include_m else v
        cols.append(F.col(f"`{e_src}`").alias(f"{v}{e_suffix}"))
        if include_m:
            cols.append(F.col(f"`{v}_M`").alias(f"{v}{m_suffix}"))
    return p.select(*cols)


def pivot_e(df: DataFrame, variables: list[str]) -> DataFrame:
    """e-only pivot with bare variable names as columns (median input)."""
    p = (
        df.groupBy("census_geoid")
        .pivot("pff_variable", variables)
        .agg(F.first("e"))
    )
    return p


def unpivot_cempz(df: DataFrame, variables: list[str], id_cols: list[str]) -> DataFrame:
    """Wide→long melt (reference acs_manual_update.py:44-56, 96-108):
    columns ``{var}{measure}`` for measure in c/e/m/p/z stack into long
    ``(id_cols..., pff_variable, c, e, m, p, z)`` rows via one
    generator-style stack expression — no shuffle."""
    measures = ["c", "e", "m", "p", "z"]
    stack_args = []
    for v in variables:
        row = [f"'{v}'"] + [f"`{v}{s}`" for s in measures]
        stack_args.append(", ".join(row))
    expr = (
        f"stack({len(variables)}, {', '.join(stack_args)}) as "
        f"(pff_variable, c, e, m, p, z)"
    )
    return df.selectExpr(*id_cols, expr)
