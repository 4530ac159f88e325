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
