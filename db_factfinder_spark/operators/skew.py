"""Skew-breaking operators: salted joins and two-phase aggregation.

Why these exist at 100 TB: a shuffle hash-partitions on the key, so a
hot key sends its entire row set to ONE reduce task — the stage runs as
long as its worst partition, and a single executor can spill or OOM
while the rest of the cluster idles.  AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``) fixes the *sort-merge join* case at
runtime and is the first tool to reach for; explicit salting is the
structural fix for the cases AQE can't touch:

* shuffle-hash joins and streaming stateful joins (no AQE re-plan);
* grouped aggregations whose partial (map-side) combine is defeated —
  high-cardinality intermediate state such as ``collect_set`` or
  ``count(DISTINCT ...)`` under a hot group key;
* deterministic layout needs (bucketed writes of skewed tables).

The trade: the small side is replicated ``salt`` times (its shuffle
volume × salt), in exchange for the big side's hot key spreading over
``salt`` reduce tasks.  Choose ``salt`` ≈ hot-key rows / target
partition rows; past ~32 the replication tax usually dominates.

The salt NEVER changes results: it only refines the partitioning key.
Join output and aggregate values are identical to the unsalted plan —
which is exactly what makes these oracle-checkable with the plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__ff_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join where the big side's hot keys are spread over ``salt``
    reduce tasks: big rows get a uniform pseudo-random salt in
    [0, salt); the small side is exploded into one copy per salt value;
    the join key becomes (key, salt).

    The merge hint pins a shuffled join: with a genuinely small right
    side Catalyst would broadcast (correct, and no skew problem — don't
    salt then); this operator targets the small-but-not-broadcastable
    regime (100 MB dim vs multi-TB skewed fact).

    ``rand(seed)`` is per-row uniform and the salt value is irrelevant
    to the output (any salt pairs a big row with exactly one small
    copy), so results equal the unsalted join for inner/left semantics.
    Right/full outer joins would see small-side copies that matched no
    big row and are deliberately rejected."""
    if how in ("right", "rightouter", "right_outer", "full", "outer", "fullouter", "full_outer"):
        raise ValueError(
            "salted_join supports inner/left joins; a right/full-outer "
            "would emit one unmatched row per small-side REPLICA"
        )
    big_s = big.withColumn(
        SALT_COL, F.floor(F.rand(seed) * salt).cast("int")
    )
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    out = big_s.join(
        small_s.hint("merge"),
        (big_s[big_key] == small_s[small_key])
        & (big_s[SALT_COL] == small_s[SALT_COL]),
        how,
    )
    return out.select(
        *[big_s[c] for c in big.columns], *[small_s[c] for c in small.columns]
    )


def two_phase_agg(
    df: DataFrame,
    key: str | list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Grouped aggregation under a hot group key, as an explicit
    partial/final split: phase 1 aggregates on (key, salt) — the hot
    key's rows spread over ``salt`` tasks — phase 2 merges the ≤ salt
    partials per key.

    ``aggs`` maps output column name → (partial_agg_expr, final_merge
    expr over the partial column).  Example (algebraic decompositions):

        two_phase_agg(df, "k", {
            "n":   (F.count(F.lit(1)),        F.sum(F.col("n"))),
            "s":   (F.sum("v"),               F.sum(F.col("s"))),
            "mx":  (F.max("v"),               F.max(F.col("mx"))),
            "uniq":(F.collect_set("u"),
                    F.size(F.array_distinct(F.flatten(F.collect_list("uniq"))))),
        })

    Only algebraic aggregates (ones with an associative merge) qualify;
    holistic ones (exact median) need a different strategy (see
    operators/median.py's set-based form)."""
    keys = [key] if isinstance(key, str) else list(key)
    salted = df.withColumn(SALT_COL, F.floor(F.rand(seed) * salt).cast("int"))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[p.alias(name) for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[f.alias(name) for name, (_, f) in aggs.items()]
    )


def adaptive_salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    hot_threshold: int,
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join that salts ONLY the detected hot keys.

    ``salted_join`` replicates the whole small side ``salt``× — the
    right call when skew is broad.  When skew is a handful of
    mega-keys (the common case: one null-ish default id, one
    celebrity, one boilerplate bucket), replicating everything wastes
    ``salt``× build memory for keys that never needed it.  This
    operator first aggregates big-side key counts (map-side combined —
    one tiny shuffle), collects keys above ``hot_threshold`` (a
    bounded driver list by definition: Σ counts ≤ |big| caps the hot
    set at |big|/threshold — the same broadcast-state exception as
    the Bloom words), then:

    * hot partition: big rows salt uniformly, small rows explode
      ``salt``× — but only the hot subset;
    * cold partition: plain equi-join, AQE free to broadcast;
    * union — each big row appears in exactly one branch.

    This is a static mirror of what AQE's skew-join does at runtime
    for sort-merge joins; doing it explicitly also covers hash
    aggregations and lets ``salt`` scale with the observed count."""
    counts = big.groupBy(big_key).agg(F.count(F.lit(1)).alias("__n"))
    hot_keys = [
        r[big_key]
        for r in counts.filter(F.col("__n") >= hot_threshold).collect()
    ]
    if not hot_keys:
        return big.join(
            small, big[big_key] == small[small_key], "inner"
        ).drop(small_key)
    big_hot = big.filter(F.col(big_key).isin(hot_keys)).withColumn(
        "__salt", (F.rand(seed) * salt).cast("int")
    )
    big_cold = big.filter(~F.col(big_key).isin(hot_keys))
    small_hot = (
        small.filter(F.col(small_key).isin(hot_keys))
        .withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    )
    small_cold = small.filter(~F.col(small_key).isin(hot_keys))
    hot = big_hot.join(
        small_hot,
        (big_hot[big_key] == small_hot[small_key])
        & (big_hot["__salt"] == small_hot["__salt"]),
        "inner",
    ).drop("__salt").drop(small_key)
    cold = big_cold.join(
        small_cold, big_cold[big_key] == small_cold[small_key], "inner"
    ).drop(small_key)
    return hot.unionByName(cold)
