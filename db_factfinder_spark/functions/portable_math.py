"""Cross-engine bit-exact math: libm-free ln for positive integers.

JVM ``Math.log`` and DuckDB/glibc ``log`` are each within 1 ulp but
DISAGREE on ~5% of real inputs (observed in q306/q308 parity), so any
oracle-checked statistic built on libm ``ln`` carries a latent
quantization-boundary flake.  ``portable_ln`` removes libm entirely:

1. dyadic split: ``x = m · 2^e`` with ``e`` from the EXACT binary
   length of the integer (string-of-bits, no log2) and ``m = x / 2^e``
   via an exact power-of-two shift-divide, so ``m ∈ [1, 2)``;
2. ``ln m = 2·atanh(z)``, ``z = (m−1)/(m+1) ∈ [0, 1/3)``, via the odd
   series up to ``z¹⁹`` (truncation < 7·10⁻¹¹ — far below any
   quantization grid in use);
3. ``ln x = e·LN2 + 2·s`` with the same double literal for LN2.

Every step is a correctly-rounded IEEE op evaluated in ONE fixed
order, mirrored token-for-token by :func:`portable_ln_sql` — two
engines computing the same op sequence on the same bits produce the
same bits, no libm involved.  Accuracy: |result − ln x| < 1e-10
relative; determinism is the contract, not the last ulp of ln.

Input contract: positive integer-valued (1 ≤ x < 2^63).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from db_factfinder_spark.functions.expr import let

__all__ = ["portable_ln", "portable_ln_sql", "LN2"]

LN2 = 0.6931471805599453  # nearest double to ln 2; shared literal

_ODD = [3.0, 5.0, 7.0, 9.0, 11.0, 13.0, 15.0, 17.0, 19.0]


def portable_ln(x: Column) -> Column:
    """libm-free ``ln`` of a positive integer-valued column — see
    module docstring for the exactness argument."""
    xi = x.cast("long")
    e = F.length(F.conv(xi.cast("string"), 10, 2)) - 1

    def with_e(ei: Column) -> Column:
        # exact 2^e as a long, no libm pow and no shiftleft (whose
        # PySpark binding takes only a Python-int shift): the binary
        # string "1" + e zeros converted back to base 10
        pow2 = F.conv(
            F.concat(F.lit("1"), F.repeat(F.lit("0"), ei)), 2, 10
        ).cast("long")
        m = xi.cast("double") / pow2.cast("double")

        def with_z(z: Column) -> Column:
            def with_z2(z2: Column) -> Column:
                s = z
                p = z
                for d in _ODD:
                    p = p * z2
                    s = s + p / F.lit(d)
                return ei.cast("double") * F.lit(LN2) + F.lit(2.0) * s

            return let(z * z, with_z2)

        return let((m - F.lit(1.0)) / (m + F.lit(1.0)), with_z)

    return let(e, with_e)


def portable_ln_sql(x: str) -> str:
    """DuckDB SQL mirroring :func:`portable_ln` op-for-op on integer
    expression ``x``.  Splices ``x`` into a self-contained scalar
    expression (keep ``x`` short — a column name — or precompute it in
    a CTE).  ``format('{:b}', v)`` gives the exact bit length;
    ``1 << e`` the exact power of two."""
    e = f"(length(format('{{:b}}', {x})) - 1)"
    m = f"(CAST({x} AS DOUBLE) / CAST((CAST(1 AS BIGINT) << {e}) AS DOUBLE))"
    z = f"(({m} - 1.0) / ({m} + 1.0))"
    z2 = f"({z} * {z})"
    s = z
    p = z
    for d in _ODD:
        p = f"({p} * {z2})"
        s = f"({s} + {p} / {d})"
    return f"(CAST({e} AS DOUBLE) * {LN2!r} + 2.0 * {s})"
