"""Bloom-filter semi-join pruning.

At cluster scale, a semi-join of a huge fact table against a selective
dimension subset ships the whole fact side through a shuffle before a
single build row is consulted.  The classic fix (used by every
warehouse engine; Spark's own AQE injects it as
``InSubqueryExec``/runtime bloom when thresholds allow) is to build a
tiny Bloom filter over the build keys, broadcast it, and drop
non-matching fact rows *at the scan*, before any exchange.  This
module implements the pattern engine-portably:

* the bitmap is built with one Spark aggregation job over the build
  side (``bit_or`` per 64-bit word) and collected to the driver — the
  same "small broadcast state" exception as the IVF centroids
  (`llmdata/similarity.py`): a few KiB cross the driver, never data;
* the probe test embeds the words as a literal array, so the filter is
  pure whole-stage-codegen column expressions (md5 → two 32-bit
  halves → Kirsch-Mitzenmacher double hashing, ``k`` bit probes);
* false positives are removed by the exact semi-join that follows —
  the Bloom stage ONLY prunes, so results are exactly the plain
  semi-join's (this is what the q112 oracle checks).

Reference scope: the factfinder reference joins per-geography frames
small enough to broadcast outright (SURVEY.md §2.3 J3); this operator
is the scale path for when the probe side is the 100 TB fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_halves(key: Column) -> tuple[Column, Column]:
    """Two independent 32-bit hashes from one md5 (portable — no
    engine-native hash)."""
    hx = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return h1, h2


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of ``k`` bit positions for ``key`` (Kirsch-Mitzenmacher:
    pos_i = (h1 + i·h2) mod m — two hashes simulate k)."""
    h1, h2 = _hash_halves(key)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (h1 + i.cast("long") * h2) % F.lit(m_bits),
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5
) -> list[int]:
    """Build the bitmap as ``m_bits/64`` longs.  One aggregation job;
    only the word array (m_bits/8 bytes) reaches the driver."""
    assert m_bits % 64 == 0
    words_set = (
        df.select(F.explode(_positions(F.col(key_col), m_bits, k)).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in words_set:
        words[r["w"]] = r["bits"]
    return words


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int, k: int = 5
) -> Column:
    """Pure-codegen membership test against the literal bitmap."""
    lit_words = F.array(*[F.lit(w).cast("long") for w in words])
    pos = _positions(key, m_bits, k)
    return F.forall(
        pos,
        lambda p: (
            F.element_at(lit_words, (p / 64).cast("int") + 1).bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                )
            )
            != 0
        ),
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Exact semi-join with Bloom pre-pruning: probe rows failing the
    bitmap are dropped before the (broadcast) exact semi-join removes
    the false positives.  Result ≡ ``probe.join(build, key,
    'left_semi')`` for ANY bitmap content — the filter only prunes."""
    words = bloom_build(build, build_key, m_bits, k)
    pruned = probe.filter(
        bloom_might_contain(F.col(probe_key), words, m_bits, k)
    )
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return pruned.join(F.broadcast(keys), probe_key, "left_semi")


def bloom_parameter_plan_sql(
    dialect: str,
    n_keys: int = 1_048_576,
    bits_per_key: tuple[int, ...] = (4, 8, 12, 16),
    max_k: int = 8,
) -> str:
    """SQL text for :func:`bloom_parameter_plan`, generated for
    ``dialect`` in {'spark', 'duckdb'} from ONE template — the only
    dialect differences are the array-literal syntax and the fold
    wrapper (Spark ``aggregate(bits, init, λ)`` vs DuckDB
    ``list_reduce(list_prepend(init, bits), λ)``; both run the
    IDENTICAL multiply sequence).

    Design: the exponent's square-and-multiply bit string is DATA (a
    per-arm array column), folded by one lambda — NOT an unrolled
    expression chain.  Measured alternatives all failed: let-bound
    Column chains cost ~100 s of py4j lambda construction, nested
    subqueries trigger superlinear analysis, and lateral column
    aliases INLINE (2^20-node tree by the 20th squaring).  The fold
    keeps the tree constant-size and the arm table is
    parameters-as-data — one 32-row scan, trivially parallel.
    """
    if dialect not in ("spark", "duckdb"):
        raise ValueError("dialect must be 'spark' or 'duckdb'")

    def arr(bits: str) -> str:
        if dialect == "spark":
            return (
                f"array({bits})" if bits else "CAST(array() AS ARRAY<INT>)"
            )
        return f"[{bits}]" if bits else "CAST([] AS INT[])"

    rows = []
    for r in bits_per_key:
        for k in range(1, max_k + 1):
            m = float(r * n_keys)
            bkn = ", ".join(bin(k * n_keys)[3:])
            bk = ", ".join(bin(k)[3:])
            rows.append(
                f"({r}, {k}, {m!r}, {arr(bkn)}, {arr(bk)})"
            )
    values = ",\n    ".join(rows)
    lam = "(acc, b) -> CASE WHEN b = 1 THEN (acc * acc) * {x} " \
          "ELSE (acc * acc) END"
    if dialect == "spark":
        fold_q = f"aggregate(bits_kn, x0, {lam.format(x='x0')})"
        fold_f = f"aggregate(bits_k, y0, {lam.format(x='y0')})"
    else:
        fold_q = (
            f"list_reduce(list_prepend(x0, bits_kn), {lam.format(x='x0')})"
        )
        fold_f = (
            f"list_reduce(list_prepend(y0, bits_k), {lam.format(x='y0')})"
        )
    return f"""
WITH arms(bits_per_key, k_hashes, m, bits_kn, bits_k) AS (VALUES
    {values}),
s1 AS (
  SELECT bits_per_key, k_hashes, bits_kn, bits_k,
    CAST(1.0 - (1.0 / CAST(m AS DOUBLE)) AS DOUBLE) AS x0
  FROM arms),
s2 AS (SELECT *, {fold_q} AS q FROM s1),
s3 AS (SELECT *, CAST(1.0 - q AS DOUBLE) AS y0 FROM s2),
s4 AS (SELECT *, {fold_f} AS fpr FROM s3)
SELECT bits_per_key, k_hashes,
  CAST(floor((fpr * 1000000000.0) + 0.5) AS BIGINT) AS fpr_nano,
  (row_number() OVER (PARTITION BY bits_per_key
     ORDER BY CAST(floor((fpr * 1000000000.0) + 0.5) AS BIGINT) ASC,
              k_hashes ASC) = 1) AS is_best_k
FROM s4
"""


def bloom_parameter_plan(
    spark,
    n_keys: int = 1_048_576,
    bits_per_key: tuple[int, ...] = (4, 8, 12, 16),
    max_k: int = 8,
) -> DataFrame:
    """Bloom-filter sizing planner: the EXACT false-positive rate
    ``(1 − (1 − 1/m)^{kn})^k`` for every (bits-per-key, k) arm — the
    table consulted before sizing the broadcast filter in
    bloom_semi_join (resizing a deployed filter rebuilds it over the
    full key set).

    No libm ``exp`` approximation: the huge power is a LEFT-TO-RIGHT
    SQUARE-AND-MULTIPLY fold over the exponent's binary digits —
    every step one IEEE multiply of identical operands, bit-identical
    cross-engine.  FPRs quantize to integer nano-units; ``is_best_k``
    marks each arm's optimum.  See
    :func:`bloom_parameter_plan_sql` for why the chain is a DATA fold
    rather than an expression chain.
    """
    return spark.sql(
        bloom_parameter_plan_sql("spark", n_keys, bits_per_key, max_k)
    )
