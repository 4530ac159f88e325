"""Chat-corpus integrity audit over array-typed conversations.

Instruction-tuning corpora arrive as (turns, roles) arrays per
conversation; before training, a pipeline validates structure: do
roles alternate, who speaks first, how is the token budget split
between roles.  The natural Spark shape is array-native: the whole
audit is ``zip_with`` / ``filter`` / ``aggregate`` higher-order
functions over the two arrays — ZERO explode, zero shuffle, pure
map-side column expressions that whole-stage-codegen compiles.  The
row-explode alternative multiplies the corpus by average turn count
and re-groups it just to compare neighbours; at 100 TB that is an
entirely avoidable shuffle of a corpus-sized frame (the q265 oracle
deliberately IS the explode+window formulation, as the independent
check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conversation_audit(
    df: DataFrame,
    turns_col: str,
    roles_col: str,
) -> DataFrame:
    """Append per-conversation audit columns to ``df``:

    * ``n_turns`` — turn count;
    * ``n_violations`` — adjacent turn pairs with the SAME role (a
      well-formed two-party chat alternates, so any > 0 fails);
    * ``starts_role0`` — whether the first speaker is role 0;
    * ``chars_role0`` / ``chars_total`` — exact character budgets.

    Requires ``n_turns >= 1`` rows (callers filter empties; the
    adjacent-pair zip of a 1-turn conversation is simply empty).
    """
    turns, roles = F.col(turns_col), F.col(roles_col)
    n = F.size(turns)
    adj_equal = F.zip_with(
        F.slice(roles, 1, n - 1),
        F.slice(roles, 2, n - 1),
        lambda a, b: a == b,
    )
    n_viol = F.size(F.filter(adj_equal, lambda v: v))

    def _chars(pred: Column) -> Column:
        per_turn = F.zip_with(
            turns,
            roles,
            lambda t, r: F.when(pred(r), F.length(t)).otherwise(F.lit(0)),
        )
        return F.aggregate(
            per_turn,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    return df.select(
        "*",
        n.alias("n_turns"),
        n_viol.alias("n_violations"),
        (F.get(roles, 0) == 0).alias("starts_role0"),
        _chars(lambda r: r == 0).alias("chars_role0"),
        _chars(lambda r: r.isNotNull()).alias("chars_total"),
    )


def truncation_plan(
    df: DataFrame,
    turns_col: str,
    max_tokens: int,
    pin_first: bool = True,
) -> DataFrame:
    """Context-window truncation planning for chat SFT data: keep the
    LATEST whole turns that fit ``max_tokens``, optionally pinning
    turn 0 (the system prompt) — the standard packing rule before
    tokenize-and-train, computed as a PLAN so the expensive re-render
    only touches conversations that actually truncate.

    Array-native like conversation_audit: per-turn whitespace token
    counts, then the smallest suffix start j whose cost
    ``pinned + Σ_{i≥j} tokens_i`` fits — O(turns²) slice-sums PER ROW
    (bounded by conversation length, never corpus size), zero
    shuffle.  ``kept_from`` is NULL whenever NO suffix turn is kept —
    both when even the pinned turn alone exceeds the budget
    (``n_kept = 0``) and when only the pinned turn fits
    (``n_kept = 1``): the sentinel means "empty suffix", never an
    out-of-range index, so ``kept_from IS NULL`` reliably selects the
    rows needing surfacing in pinned AND unpinned modes.

    Appends: ``n_turns, total_tokens, kept_from`` (0-based index of
    the first kept suffix turn, NULL for an empty suffix),
    ``n_kept, kept_tokens``.
    Requires ≥ 1 turn per row (the conversation_audit contract).
    """
    from db_factfinder_spark.functions.expr import let
    from db_factfinder_spark.llmdata.textstats import tokens

    start = 1 if pin_first else 0

    def with_tk(tk: Column) -> Column:
        n = F.size(tk)
        pinned = (
            F.element_at(tk, 1) if pin_first else F.lit(0).cast("long")
        )

        def suffix_sum(j: Column) -> Column:
            return F.aggregate(
                F.slice(tk, j + 1, n - j),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )

        cands = F.filter(
            F.sequence(F.lit(start), n),
            lambda j: pinned + suffix_sum(j) <= F.lit(max_tokens),
        )

        def with_kf(kf: Column) -> Column:
            return F.struct(
                n.alias("n_turns"),
                F.aggregate(
                    tk, F.lit(0).cast("long"), lambda a, x: a + x
                ).alias("total_tokens"),
                F.when(kf < n, kf).alias("kept_from"),
                F.when(
                    kf.isNotNull(),
                    (n - kf) + F.lit(1 if pin_first else 0),
                ).otherwise(F.lit(0)).alias("n_kept"),
                F.when(kf.isNotNull(), pinned + suffix_sum(kf))
                .otherwise(F.lit(0).cast("long"))
                .alias("kept_tokens"),
            )

        return let(F.array_min(cands), with_kf)

    plan = let(
        F.transform(
            F.col(turns_col), lambda t: F.size(tokens(t)).cast("long")
        ),
        with_tk,
    )
    return df.withColumn("__p", plan).select(
        *df.columns,
        F.col("__p.n_turns").alias("n_turns"),
        F.col("__p.total_tokens").alias("total_tokens"),
        F.col("__p.kept_from").alias("kept_from"),
        F.col("__p.n_kept").alias("n_kept"),
        F.col("__p.kept_tokens").alias("kept_tokens"),
    ).drop("__p")
