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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_factfinder_spark.functions.portable_math import portable_ln

__all__ = ["dp_noisy_counts", "l_diversity_audit"]


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
