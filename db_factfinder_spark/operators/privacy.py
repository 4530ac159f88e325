"""Differentially-private released aggregates (Laplace mechanism)
with DETERMINISTIC, seed-derived noise.

``noisy_count = count + Laplace(sensitivity/epsilon)``, the textbook
ε-DP count release (Dwork et al., TCC 2006).  The noise here is
derived from ``md5(seed, group key)`` — fully deterministic, which is
the REPLAY/TEST mode: results are reproducible, oracle-checkable, and
stable across retries of the same release.  THIS IS NOT A PRIVATE
RELEASE BY ITSELF — an adversary who knows the seed can subtract the
noise.  Production use must supply a fresh secret ``seed`` per
release and rotate it; with a secret uniformly-chosen seed the
mechanism is the standard PRF-instantiated Laplace release.

Noise construction (all exact / portable):
  h₁, h₂  = independent 28-bit md5 hashes of the keyed seed
  Expᵢ    = −b·ln(uᵢ),  uᵢ = (hᵢ+1)/2²⁸  ∈ (0, 1]
  Laplace = Exp₁ − Exp₂ = b·(ln(h₂+1) − ln(h₁+1))
(the difference-of-exponentials identity — the 1/2²⁸ normalizers
cancel, so the whole draw is ``portable_ln`` on INTEGERS: bit-exact
cross-engine, no libm).  Noise is quantized to integer units so sums
and comparisons are order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from db_factfinder_spark.functions.portable_math import portable_ln

__all__ = ["dp_noisy_counts", "l_diversity_audit", "t_closeness_audit"]


def _h28(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    sensitivity: int = 1,
    seed: str = "release-1",
    quantize: int = 1_000_000,
) -> DataFrame:
    """ε-DP noisy counts per group under the deterministic-seed
    contract (module docstring).  ``sensitivity`` is the max rows one
    individual contributes (1 for unique-per-row ids).

    Returns ``*group_cols, n, noise_units, noisy_count`` where
    ``noisy_count = n + noise_units/quantize`` (one mirrored terminal
    division-and-add).
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    b = float(sensitivity) / float(epsilon)
    per = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    key = F.concat_ws(
        "|", F.lit(seed), *[F.col(c).cast("string") for c in group_cols]
    )
    h1 = _h28(F.concat(key, F.lit(":1")))
    h2 = _h28(F.concat(key, F.lit(":2")))
    lap = F.lit(b) * (portable_ln(h2 + 1) - portable_ln(h1 + 1))
    units = F.floor(lap * F.lit(float(quantize)) + 0.5).cast("long")
    return per.select(
        *group_cols,
        "n",
        units.alias("noise_units"),
        (
            F.col("n").cast("double")
            + units.cast("double") / F.lit(float(quantize))
        ).alias("noisy_count"),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_threshold: int = 2,
) -> DataFrame:
    """l-diversity audit — k-anonymity's companion: a quasi-identifier
    group is l-diverse when its SENSITIVE attribute takes at least
    ``l`` distinct values (a 50-person group that all share one
    diagnosis is k-anonymous yet fully disclosive).

    One (quasi, sensitive) distinct + one group aggregate.  Returns
    per quasi-group: ``*quasi_cols, group_size, n_sensitive_values,
    is_diverse`` — the release gate joins this back and suppresses
    non-diverse groups.
    """
    per = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.count_distinct(F.col(sensitive_col)).alias("n_sensitive_values"),
    )
    return per.withColumn(
        "is_diverse", F.col("n_sensitive_values") >= l_threshold
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    ordered_col: str,
    t: tuple[int, int] = (1, 5),
) -> DataFrame:
    """t-closeness audit — the third rung after k-anonymity and
    l-diversity: a quasi-identifier group leaks when the DISTRIBUTION
    of its sensitive attribute strays from the global one, even if it
    is diverse.  For an ORDERED sensitive attribute the Earth Mover's
    Distance has the closed form (Li et al. 2007 §5.2)

        EMD(g) = (1/(m-1)) · Σ_c |CumP_g(c) − CumP_all(c)|

    over the m ordered categories.  Computed in EXACT integers: each
    cumulative-probability difference is the rational
    ``(cum_g·N − cum_all·n_g) / (n_g·N)``, so the per-group sum of
    absolute numerators is an exact long and the EMD is ONE IEEE
    division at the end.  The ``t`` threshold is an integer rational
    compared by cross-multiplication — no float enters the decision.

    Magnitude contract: ``n_g·N·(m−1)`` must stay below 2^53 (exact
    as a double) — at m ≤ ~100 that is tables to ~30M rows; larger
    tables bucket the sensitive attribute coarser (they should
    anyway: m is the release grid, not the raw domain).

    Plan: one (quasi × category) count, a broadcast category-spine
    right-join to materialize zero cells, one bounded per-group window
    (m rows per group), one group aggregate — all keyed on the quasi
    columns, so AQE reuses the exchange.
    """
    tn, td = t
    cat = F.col(ordered_col)
    cats = (
        df.groupBy(cat.alias("__cat"))
        .agg(F.count(F.lit(1)).alias("__nc"))
        .select(
            "__cat",
            F.sum("__nc").over(
                Window.orderBy("__cat").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ).alias("__cum_all"),
            F.sum("__nc").over(
                Window.orderBy(F.lit(1)).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("__n_all"),
        )
    )
    groups = df.groupBy(*quasi_cols, cat.alias("__cat2")).agg(
        F.count(F.lit(1)).alias("__ng_c")
    )
    spine = (
        df.select(*quasi_cols).distinct().crossJoin(F.broadcast(cats))
    )
    cells = spine.join(
        groups,
        [
            spine[q].eqNullSafe(groups[q]) for q in quasi_cols
        ] + [spine["__cat"].eqNullSafe(groups["__cat2"])],
        "left",
    ).select(
        *[spine[q] for q in quasi_cols],
        "__cat", "__cum_all", "__n_all",
        F.coalesce(F.col("__ng_c"), F.lit(0)).alias("__c"),
    )
    wg = (
        Window.partitionBy(*quasi_cols)
        .orderBy("__cat")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*quasi_cols)
    cum = cells.withColumns(
        {
            "__cum_g": F.sum("__c").over(wg),
            "__n_g": F.sum("__c").over(wtot),
        }
    )
    agg = cum.groupBy(*quasi_cols).agg(
        F.max("__n_g").alias("__n_g"),
        F.max("__n_all").alias("__N"),
        F.count(F.lit(1)).alias("__m"),
        F.sum(
            F.abs(
                F.col("__cum_g") * F.col("__n_all")
                - F.col("__cum_all") * F.col("__n_g")
            )
        ).alias("__s"),
    )
    den = F.col("__n_g") * F.col("__N") * (F.col("__m") - 1)
    # m == 1 (single global category): no mass can be displaced — EMD
    # is 0 by convention, not 0/0
    emd = F.when(
        F.col("__m") > 1, F.col("__s").cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))
    return agg.select(
        *quasi_cols,
        F.col("__n_g").cast("long").alias("group_size"),
        emd.alias("emd"),
        (F.col("__s") * F.lit(td) <= den * F.lit(tn)).alias("is_close"),
    )
