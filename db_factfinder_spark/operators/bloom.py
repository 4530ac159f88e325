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

from pyspark.sql import Column, DataFrame
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
