"""The ten special-variable formulas as column expressions.

Reference special.py:40-142.  Each takes the *pivoted* frame (columns
``{base_variable}e`` / ``{base_variable}m``) and produces ``e``/``m``.
The asymmetric e/m denominators (e.g. ``mnhhinc`` divides e by ``hh2e``
but m by ``hh5e``) are deliberate in the reference — different census
bases — and replicated exactly (SURVEY §2.6 F6).

ANSI note: the reference's numpy division by zero yields ±inf; these
expressions yield NULL (try_divide).  Zero bases only occur for empty
geographies whose rows the cleaning cascade nulls out anyway.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_factfinder_spark.functions.stats import vacancy_rate_moe


def _ratio_e(num: str, den: Column | str) -> Column:
    den = F.col(den) if isinstance(den, str) else den
    return F.try_divide(F.col(num), den)


def _ratio_m(num_e: str, num_m: str, den_e: str, den_m: str) -> Column:
    """(1/den_e)·sqrt(num_m² + (num_e·den_m/den_e)²) — special.py:40-73."""
    ne, nm = F.col(num_e), F.col(num_m)
    de, dm = F.col(den_e), F.col(den_m)
    return F.try_divide(
        F.sqrt(nm * nm + F.pow(F.try_divide(ne * dm, de), 2)), de
    )


def percapinc(df: DataFrame) -> DataFrame:
    """special.py:40-48: e = agip15ple/pop_6e; ratio MOE on pop_6."""
    return df.withColumns(
        {
            "e": _ratio_e("agip15ple", "pop_6e"),
            "m": _ratio_m("agip15ple", "agip15plm", "pop_6e", "pop_6m"),
        }
    )


def mntrvtm(df: DataFrame) -> DataFrame:
    """special.py:51-62: e-denominator is wrkr16ple − cw_wrkdhme but the
    m-denominator is wrkrnothme (same quantity computed upstream) —
    replicated verbatim."""
    return df.withColumns(
        {
            "e": _ratio_e("agttme", F.col("wrkr16ple") - F.col("cw_wrkdhme")),
            "m": _ratio_m("agttme", "agttmm", "wrkrnothme", "wrkrnothmm"),
        }
    )


def mnhhinc(df: DataFrame) -> DataFrame:
    """special.py:65-73: e uses hh2e, m uses hh5e/hh5m."""
    return df.withColumns(
        {
            "e": _ratio_e("aghhince", "hh2e"),
            "m": _ratio_m("aghhince", "aghhincm", "hh5e", "hh5m"),
        }
    )


def avghhsooc(df: DataFrame) -> DataFrame:
    """special.py:76-82: e denom oochu1e, m denom oochu4e/oochu4m."""
    return df.withColumns(
        {
            "e": _ratio_e("popoochue", "oochu1e"),
            "m": _ratio_m("popoochue", "popoochum", "oochu4e", "oochu4m"),
        }
    )


def avghhsroc(df: DataFrame) -> DataFrame:
    """special.py:85-91: e denom rochu1e, m denom rochu2e/rochu2m."""
    return df.withColumns(
        {
            "e": _ratio_e("poprtochue", "rochu1e"),
            "m": _ratio_m("poprtochue", "poprtochum", "rochu2e", "rochu2m"),
        }
    )


def avghhsz(df: DataFrame) -> DataFrame:
    """special.py:94-100: e denom hh1e, m denom hh4e/hh4m (numerator
    roles swapped in the radical exactly as the reference writes it —
    hh4m² term uses hhpop1e)."""
    e = _ratio_e("hhpop1e", "hh1e")
    m = F.try_divide(
        F.sqrt(
            F.col("hhpop1m") * F.col("hhpop1m")
            + F.pow(F.try_divide(F.col("hh4m") * F.col("hhpop1e"), F.col("hh4e")), 2)
        ),
        F.col("hh4e"),
    )
    return df.withColumns({"e": e, "m": m})


def avgfmsz(df: DataFrame) -> DataFrame:
    """special.py:103-109: same shape as avghhsz over family counts."""
    e = _ratio_e("popinfmse", "fam1e")
    m = F.try_divide(
        F.sqrt(
            F.col("popinfmsm") * F.col("popinfmsm")
            + F.pow(
                F.try_divide(F.col("fam3m") * F.col("popinfmse"), F.col("fam3e")), 2
            ),
        ),
        F.col("fam3e"),
    )
    return df.withColumns({"e": e, "m": m})


def hovacrt(df: DataFrame) -> DataFrame:
    """special.py:112-122: owner vacancy rate; e == 0 → NULL."""
    e = F.lit(100) * _ratio_e("vacsalee", "hovacue")
    m = vacancy_rate_moe("hovacue", "vacsalee", "vacsalem", "hovacum")
    out = df.withColumns({"e": e, "m": m})
    return out.withColumn(
        "e", F.when(F.col("e") == 0, F.lit(None).cast("double")).otherwise(F.col("e"))
    )


def rntvacrt(df: DataFrame) -> DataFrame:
    """special.py:125-135: renter vacancy rate; e == 0 → NULL."""
    e = F.lit(100) * _ratio_e("vacrnte", "rntvacue")
    m = vacancy_rate_moe("rntvacue", "vacrnte", "vacrntm", "rntvacum")
    out = df.withColumns({"e": e, "m": m})
    return out.withColumn(
        "e", F.when(F.col("e") == 0, F.lit(None).cast("double")).otherwise(F.col("e"))
    )


def wrkrnothm(df: DataFrame) -> DataFrame:
    """special.py:138-142: difference estimate, sqrt(m₁²+m₂²) MOE."""
    return df.withColumns(
        {
            "e": F.col("wrkr16ple") - F.col("cw_wrkdhme"),
            "m": F.sqrt(
                F.col("wrkr16plm") * F.col("wrkr16plm")
                + F.col("cw_wrkdhmm") * F.col("cw_wrkdhmm")
            ),
        }
    )


# Dynamic dispatch registry — replaces the reference's
# ``globals()[pff_variable]`` lookup (calculate.py:192-193).
SPECIAL_FUNCTIONS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "percapinc": percapinc,
    "mntrvtm": mntrvtm,
    "mnhhinc": mnhhinc,
    "avghhsooc": avghhsooc,
    "avghhsroc": avghhsroc,
    "avghhsz": avghhsz,
    "avgfmsz": avgfmsz,
    "hovacrt": hovacrt,
    "rntvacrt": rntvacrt,
    "wrkrnothm": wrkrnothm,
}
