"""Approximate string matching — edit-distance joins without the
cross product.

A fuzzy join written naively is |L|×|R| ``levenshtein`` calls; at any
real size that cross product is the whole cost.  The FastSS/deletion-
neighborhood trick blocks it: two strings within edit distance 1
(insert / delete / substitute) ALWAYS share a member of each other's
deletion neighborhood D(s) = {s} ∪ {s minus one character}, so the
candidate set is an EQUI-join on exploded neighborhood keys — linear
in data, |s|+1 keys per string — and the (cheap, integer, engine-
portable) ``levenshtein`` verify runs on candidates only.  Sharing a
key is necessary but not sufficient ("ab"/"ba" share keys at distance
2), which is exactly why the verify stage exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def deletion_neighborhood(s: Column) -> Column:
    """D(s): the string plus every single-character deletion (distinct,
    as an array).  Empty/NULL strings get just themselves."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - F.lit(1)),
            s.substr(i + F.lit(1), F.length(s)),
        ),
    )
    return F.when(
        F.length(s) > 0, F.array_distinct(F.concat(F.array(s), dels))
    ).otherwise(F.array(s))


def edit1_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
) -> DataFrame:
    """All (left, right) pairs with levenshtein ≤ 1 — deletion-
    neighborhood candidate equi-join + exact verify.  Returns
    ``left_id, right_id, dist``."""
    lk = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_str).alias("__ls"),
        F.explode(deletion_neighborhood(F.col(left_str))).alias("__k"),
    )
    rk = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_str).alias("__rs"),
        F.explode(deletion_neighborhood(F.col(right_str))).alias("__k"),
    )
    cands = (
        lk.join(rk, "__k")
        .select("__lid", "__ls", "__rid", "__rs")
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein("__ls", "__rs"))
        .filter(F.col("dist") <= 1)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            "dist",
        )
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 3,
    max_dist: int = 1,
    partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95):
    candidate pairs are records within ``window`` positions of each
    other in the GLOBAL sort order of the blocking key, verified by
    exact levenshtein ≤ ``max_dist`` — the other classic
    entity-resolution blocker next to ``edit1_join``'s deletion
    neighborhoods, with the opposite trade-off (O(n·w) candidates
    whatever the string length, but misses matches whose typo moves
    them further than ``window`` sort positions; first-character
    typos are its known blind spot).

    The global sort is ``global_rank`` (range-repartition + offset
    broadcast — never a single ORDER BY task), and the neighborhood
    join is an EXPLODED EQUI-join on rank+offset (offsets 1..window),
    not a rank-range inequality join: bounded fan-out, hash-joinable,
    AQE-splittable.

    Output: ``id_a, id_b, key_a, key_b, dist`` — one row per verified
    pair, a's rank below b's.
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize
    from db_factfinder_spark.operators.ranking import global_rank

    if window < 1:
        raise ValueError("window must be >= 1")
    ranked = materialize(
        global_rank(
            records.select(
                F.col(key_col).alias("__k"), F.col(id_col).alias("__id")
            ),
            ["__k", "__id"],
            partitions=partitions,
            checkpoint_mode=checkpoint_mode,
        ),
        checkpoint_mode,
    )
    lhs = ranked.select(
        F.col("__id").alias("id_a"),
        F.col("__k").alias("key_a"),
        F.col("rank"),
        F.explode(
            F.array(*[F.lit(o) for o in range(1, window + 1)])
        ).alias("__off"),
    ).select(
        "id_a", "key_a", (F.col("rank") + F.col("__off")).alias("__r2")
    )
    rhs = ranked.select(
        F.col("__id").alias("id_b"),
        F.col("__k").alias("key_b"),
        F.col("rank").alias("__r2"),
    )
    return (
        lhs.join(rhs, "__r2")
        .withColumn("dist", F.levenshtein("key_a", "key_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "key_a", "key_b", "dist")
    )


def fellegi_sunter_score(
    pairs: DataFrame,
    agreements: dict[str, Column],
    weights: dict[str, tuple[int, int]],
    upper: int,
    lower: int,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record-linkage decision over a
    CANDIDATE pair frame (blocking — FastSS, LSH, sorted
    neighborhood — has already bounded the pair space; this operator
    never joins).

    Classic FS: each comparison field contributes log(m/u) on
    agreement and log((1−m)/(1−u)) on disagreement, and the summed
    score thresholds into match / possible / non-match.  The weights
    arrive as PRE-TRAINED milli-log-odds integer literals
    (``{field: (w_agree, w_disagree)}``) — the same
    literal-not-libm rule as the Benford probabilities: training
    computes logs offline once; the engine-side score is a pure
    integer sum, bit-identical anywhere and immune to summation
    order.

    Output: input columns + per-field boolean flags
    (``agr_<field>``), integer ``fs_score`` (milli-log-odds), and
    ``decision`` in {'match', 'possible', 'non_match'} by
    ``score ≥ upper`` / ``≥ lower``.
    """
    out = pairs
    score = F.lit(0)
    for name, agree in agreements.items():
        wa, wd = weights[name]
        flag = F.coalesce(agree, F.lit(False))
        out = out.withColumn(f"agr_{name}", flag)
        score = score + F.when(
            F.col(f"agr_{name}"), F.lit(int(wa))
        ).otherwise(F.lit(int(wd)))
    return out.withColumn("fs_score", score.cast("long")).withColumn(
        "decision",
        F.when(F.col("fs_score") >= upper, F.lit("match"))
        .when(F.col("fs_score") >= lower, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )


def typeahead_completions(
    df: DataFrame,
    text_col: str = "text",
    max_prefix_len: int = 3,
    k: int = 3,
) -> DataFrame:
    """Build a typeahead (autocomplete) completion index: for every
    token prefix up to ``max_prefix_len`` chars, the top-``k`` corpus
    tokens by frequency (ties broken lexicographically).

    Scale shape: the corpus collapses to its VOCABULARY first (one
    map-side-combined token count — corpus-sized input, vocab-sized
    output), prefixes explode off the vocab (≤ max_prefix_len rows per
    distinct token), and the per-prefix top-k window partitions on the
    prefix — every partition is bounded by the number of vocab tokens
    sharing that prefix, never by corpus size.
    """
    from db_factfinder_spark.llmdata.textstats import tokens

    vocab = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pref = vocab.select(
        "token",
        "cnt",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.length("token"), F.lit(max_prefix_len)),
                ),
                lambda i: F.col("token").substr(F.lit(1), i),
            )
        ).alias("prefix"),
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("cnt"), F.asc("token"))
    return (
        pref.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("prefix", "rank", "token", "cnt")
    )
