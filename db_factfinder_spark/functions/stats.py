"""ACS margin-of-error statistics as native Spark column expressions.

The reference applies these row-at-a-time with ``df.apply(axis=1)``
(utils.py:24-48, geography/2010_to_2020.py:71-80, special.py:21-37,
geography/__init__.py:6-7).  Here each is a pure ``Column`` expression:
JVM-side, codegen'd, vectorized — no Python in the hot path, which is
the difference between minutes and hours at 100 TB.

NULL-vs-NaN discipline: SQL NULL stands in for the reference's
``np.nan``.  Where pandas semantics differ from NULL propagation
(skipna sums, NaN→0 in MOE aggregation, NaN comparisons being False),
the expressions encode the pandas behavior explicitly and say so.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Census sentinel codes meaning "no data" (reference utils.py:8-21).
OUTLIER_SENTINELS = [
    999999999.0,
    333333333.0,
    222222222.0,
    666666666.0,
    888888888.0,
    555555555.0,
    -999999999.0,
    -333333333.0,
    -222222222.0,
    -666666666.0,
    -888888888.0,
    -555555555.0,
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hsum(cols: list[Column | str]) -> Column:
    """Horizontal (row-wise) sum across columns, skipping NULLs.

    pandas ``df[cols].sum(axis=1)`` skips NaN and yields 0.0 when every
    input is NaN (reference calculate.py:100); plain SQL ``+`` would
    propagate NULL instead, so each term is coalesced to 0.
    """
    out = F.lit(0.0)
    for c in cols:
        out = out + F.coalesce(_c(c).cast("double"), F.lit(0.0))
    return out


def hmoe(cols: list[Column | str]) -> Column:
    """Horizontal MOE combination ``sqrt(Σ m_i²)``, skipping NULLs.

    Reference calculate.py:101-105 (``(df[M]**2).sum(axis=1)**0.5``).
    """
    out = F.lit(0.0)
    for c in cols:
        m = _c(c).cast("double")
        out = out + F.coalesce(m * m, F.lit(0.0))
    return F.sqrt(out)


def agg_moe(m: Column | str) -> Column:
    """Vertical (grouped) MOE aggregate ``sqrt(Σ m²)`` with NaN→0.

    The reference's custom UDAF (geography/__init__.py:6-7) treats NaN
    as 0, so an all-NULL group aggregates to 0.0, not NULL.  Expressed
    natively — Spark gives partial (map-side) aggregation for free.
    """
    mm = _c(m).cast("double")
    return F.sqrt(F.coalesce(F.sum(mm * mm), F.lit(0.0)))


def sum_skipna(e: Column | str) -> Column:
    """Grouped sum matching pandas ``groupby().sum()`` (min_count=0):
    an all-NULL group yields 0.0, not NULL (geography/2010_to_2020.py:58-61).
    """
    return F.coalesce(F.sum(_c(e).cast("double")), F.lit(0.0))


def get_c(e: Column | str, m: Column | str) -> Column:
    """Coefficient of variation: NULL if e==0 else m/1.645/e*100
    (reference utils.py:24-28).  NULL inputs propagate, matching the
    NaN-in → NaN-out behavior of the pandas apply.
    """
    e, m = _c(e), _c(m)
    return F.when(e == 0, F.lit(None).cast("double")).otherwise(
        m / F.lit(1.645) / e * 100
    )


def get_p(e: Column | str, agg_e: Column | str) -> Column:
    """Percent of base: NULL if agg_e==0 else e/agg_e*100
    (reference utils.py:31-35)."""
    e, agg_e = _c(e), _c(agg_e)
    return F.when(agg_e == 0, F.lit(None).cast("double")).otherwise(e / agg_e * 100)


def get_z(
    e: Column | str,
    m: Column | str,
    p: Column | str,
    agg_e: Column | str,
    agg_m: Column | str,
) -> Column:
    """Percent MOE with the ACS ratio-MOE fallback (utils.py:38-48):

    NULL if p in {0, 100} or agg_e == 0; if ``m² − (e·agg_m/agg_e)²``
    is negative use ``sqrt(m² + (…)²)/agg_e·100`` else the ``−`` form.
    """
    e, m, p, agg_e, agg_m = _c(e), _c(m), _c(p), _c(agg_e), _c(agg_m)
    ratio_term = (e * agg_m / agg_e) * (e * agg_m / agg_e)
    return (
        F.when(p == 0, F.lit(None).cast("double"))
        .when(p == 100, F.lit(None).cast("double"))
        .when(agg_e == 0, F.lit(None).cast("double"))
        .when(m * m - ratio_term < 0, F.sqrt(m * m + ratio_term) / agg_e * 100)
        .otherwise(F.sqrt(m * m - ratio_term) / agg_e * 100)
    )


def ratio_moe(
    num_e: Column | str,
    num_m: Column | str,
    den_e: Column | str,
    den_m: Column | str,
) -> Column:
    """ACS ratio MOE ``(1/den_e)·sqrt(num_m² + (num_e·den_m/den_e)²)``
    — the shape shared by the special-variable formulas
    (reference special.py:40-109)."""
    num_e, num_m, den_e, den_m = _c(num_e), _c(num_m), _c(den_e), _c(den_m)
    return (
        F.sqrt(num_m * num_m + F.pow(num_e * den_m / den_e, 2)) / den_e
    )


def vacancy_rate_moe(
    den_e: Column | str,
    num_e: Column | str,
    num_m: Column | str,
    den_m: Column | str,
) -> Column:
    """Vacancy-rate MOE (reference special.py:21-37, ``hovacrtm``):
    0 if den_e==0 or num_e==0; otherwise the ± ratio-MOE fallback scaled
    by 100.  Argument order matches the reference call sites
    (hovacue, vacsalee, vacsalem, hovacum)."""
    den_e, num_e, num_m, den_m = _c(den_e), _c(num_e), _c(num_m), _c(den_m)
    ratio_term = F.pow(num_e * den_m / den_e, 2)
    return (
        F.when(den_e == 0, F.lit(0.0))
        .when(num_e == 0, F.lit(0.0))
        .when(
            num_m * num_m - ratio_term < 0,
            F.sqrt(num_m * num_m + ratio_term) / den_e * 100,
        )
        .otherwise(F.sqrt(num_m * num_m - ratio_term) / den_e * 100)
    )


def convert_moe(
    e_2010: Column | str,
    m_2010: Column | str,
    e_2020: Column | str,
    ratio: Column | str,
) -> Column:
    """Tract-split MOE deflation for the 2010→2020 crosswalk
    (reference geography/2010_to_2020.py:71-80):

    * ratio == 1           → m unchanged
    * e_2020 == 0          → NULL
    * (ratio·100)^0.56901 · 7.96309 ≥ 100 → m unchanged
    * else                 → scaled m (empirical power law)
    """
    m_2010, e_2020, ratio = _c(m_2010), _c(e_2020), _c(ratio)
    factor = F.pow(ratio * 100, F.lit(0.56901)) * F.lit(7.96309)
    return (
        F.when(ratio == 1, m_2010)
        .when(e_2020 == 0, F.lit(None).cast("double"))
        .when(factor >= 100, m_2010)
        .otherwise(factor / 100 * m_2010)
    )


def round_half_even(col: Column | str, digits: int) -> Column:
    """Banker's rounding — pandas/numpy ``round`` semantics
    (reference utils.py:51-60).  Spark's ``F.round`` is HALF_UP;
    ``F.bround`` is the HALF_EVEN match."""
    return F.bround(_c(col), digits)


def round_cempz(digits: int) -> dict[str, Column]:
    """The reference's per-variable rounding rule (utils.py:51-60):
    c/p/z to 1 digit, e/m to the catalog's digit count — all half-even.
    Returns withColumns-ready mapping."""
    return {
        "c": F.bround(F.col("c"), 1),
        "e": F.bround(F.col("e"), digits),
        "m": F.bround(F.col("m"), digits),
        "p": F.bround(F.col("p"), 1),
        "z": F.bround(F.col("z"), 1),
    }


def scrub_sentinels(col: Column | str) -> Column:
    """Replace census sentinel codes with NULL (reference
    download.py:86,140 / utils.py:8-21)."""
    c = _c(col)
    return F.when(c.isin(OUTLIER_SENTINELS), F.lit(None).cast("double")).otherwise(
        c.cast("double")
    )
