"""Iterative proportional fitting (IPF / survey raking) in fixed
point — adjust a weighted contingency table so its row and column
margins hit target totals, the post-stratification step every census
/ survey pipeline runs after nonresponse (Deming & Stephan 1940;
the reference engine's ACS numbers are themselves raked upstream by
the Census Bureau).

Engine-portable by the repo's fixed-point rule: cell weights live in
integer micro-units; each half-round computes the margin in EXACT
integer arithmetic, scales every cell by target/margin (one double
multiply+divide in fixed order), and REQUANTIZES to micro-units via
floor(x + 0.5).  A floating-weight IPF would make round-2 margins
order-dependent double sums — irreproducible across partitionings;
requantization keeps every aggregation an exact integer sum at the
cost of ≤ 0.5 micro-unit per cell per half-round (bounded,
documented, and far below survey-weight precision).

Plan: per round, two aggregate+broadcast-join passes (margins are
|rows|- and |cols|-sized — tiny); cells never shuffle except the
margin groupBys.  Convergence for well-posed margins is geometric;
``rounds`` is a small constant in practice.

Each half-round references the running cell frame TWICE (margin
aggregate + the join input), so without lineage truncation the
computation tree doubles per half-round — O(2^rounds) recompute and
an exponentially deep Catalyst plan (observed: rounds=8 hangs the
optimizer).  ``checkpoint_mode`` (see ``llmdata/checkpointing.py``)
truncates after every half-round, keeping both plan depth and work
linear in ``rounds`` — the same policy the connected-components and
admission-gate iterations use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_factfinder_spark.llmdata.checkpointing import materialize


def ipf_rake(
    cells: DataFrame,
    row_col: str,
    col_col: str,
    weight_units: str,
    row_targets: DataFrame,
    col_targets: DataFrame,
    rounds: int = 2,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Rake ``cells`` (one row per contingency cell, integer
    ``weight_units``) toward ``row_targets`` (``row_col,
    target_units``) and ``col_targets`` (``col_col, target_units``),
    alternating row and column adjustments ``rounds`` times.

    Returns the cell frame with ``weight_units`` updated plus the
    final margins' absolute errors per row/col key are derivable by
    the caller; zero-margin groups keep their (zero) weights — the
    scale factor is guarded NULL→1.
    """
    out = cells.select(
        F.col(row_col).alias("__r"),
        F.col(col_col).alias("__c"),
        F.col(weight_units).cast("long").alias("__w"),
    )
    rt = row_targets.select(
        F.col(row_col).alias("__r"),
        F.col("target_units").cast("long").alias("__rt"),
    )
    ct = col_targets.select(
        F.col(col_col).alias("__c"),
        F.col("target_units").cast("long").alias("__ct"),
    )
    for _ in range(rounds):
        rm = out.groupBy("__r").agg(F.sum("__w").alias("__rm"))
        out = (
            out.join(F.broadcast(rm), "__r")
            .join(F.broadcast(rt), "__r")
            .select(
                "__r", "__c",
                F.when(
                    F.col("__rm") > 0,
                    F.floor(
                        F.col("__w").cast("double")
                        * F.col("__rt").cast("double")
                        / F.col("__rm").cast("double")
                        + F.lit(0.5)
                    ).cast("long"),
                ).otherwise(F.col("__w")).alias("__w"),
            )
        )
        out = materialize(out, checkpoint_mode)
        cm = out.groupBy("__c").agg(F.sum("__w").alias("__cm"))
        out = (
            out.join(F.broadcast(cm), "__c")
            .join(F.broadcast(ct), "__c")
            .select(
                "__r", "__c",
                F.when(
                    F.col("__cm") > 0,
                    F.floor(
                        F.col("__w").cast("double")
                        * F.col("__ct").cast("double")
                        / F.col("__cm").cast("double")
                        + F.lit(0.5)
                    ).cast("long"),
                ).otherwise(F.col("__w")).alias("__w"),
            )
        )
        out = materialize(out, checkpoint_mode)
    return out.select(
        F.col("__r").alias(row_col),
        F.col("__c").alias(col_col),
        F.col("__w").alias(weight_units),
    )
