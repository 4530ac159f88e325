"""Leakage-free categorical feature encoding.

Target (mean) encoding replaces a high-cardinality category with the
mean of the target over that category — but the naive version leaks
each row's own label into its feature.  The standard fix is
leave-one-out: row i of category g gets (Σy_g − y_i)/(n_g − 1), and
its smoothed variant shrinks small categories toward the global mean
with pseudo-count m (Micci-Barreca, SIGKDD Explorations 2001).

Both are computed here as exact-integer rationals with ONE IEEE
division each — the smoothed encoding folds the global-mean prior in
cross-multiplied form,

    enc_s = (N·(Σy_g − y_i) + m·T) / (N·(n_g − 1 + m))

(T = global target sum, N = global rows), so no intermediate float
mean ever rounds.  Plan: one groupBy to per-category sufficient
statistics, broadcast back onto the rows (category tables are small
by construction — that's why the encoding exists), plus one scalar
global aggregate crossJoin-broadcast.  No window, no self-join;
map-side after the two joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["target_encode_loo", "m_estimate_rates", "woe_encode"]


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    smoothing: int = 10,
) -> DataFrame:
    """Leave-one-out and prior-smoothed target encodings of
    ``cat_col`` against the integer ``target_col``.

    ``enc_loo`` is NULL for singleton categories (nothing to leave
    out); ``enc_smooth`` is always defined for ``smoothing > 0``.
    Output: ``id_col, cat_col, <target_col>, enc_loo, enc_smooth``.
    """
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    y = F.col(target_col).cast("long")
    base = df.select(id_col, cat_col, y.alias(target_col))
    stats = base.groupBy(cat_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(target_col).alias("__s"),
    )
    glob = base.agg(
        F.count(F.lit(1)).cast("long").alias("__gn"),
        F.sum(target_col).cast("long").alias("__gt"),
    )
    j = base.join(F.broadcast(stats), cat_col).crossJoin(F.broadcast(glob))
    loo_num = F.col("__s") - F.col(target_col)
    return j.select(
        id_col,
        cat_col,
        target_col,
        F.when(
            F.col("__n") > 1,
            loo_num.cast("double") / (F.col("__n") - 1).cast("double"),
        ).alias("enc_loo"),
        F.when(
            (F.col("__n") - 1 + smoothing) > 0,
            (F.col("__gn") * loo_num + smoothing * F.col("__gt"))
            .cast("double")
            / (F.col("__gn") * (F.col("__n") - 1 + smoothing))
            .cast("double"),
        ).alias("enc_smooth"),
    )


def m_estimate_rates(
    df: DataFrame,
    group_cols: list[str],
    hit_col: str,
    m: int,
) -> DataFrame:
    """Bayesian m-estimate smoothing of per-group rates — the
    cold-start fix for CTR/quality rankings where a 1-for-1 newcomer
    would otherwise outrank a 980-for-1000 veteran.

    ``smoothed = (hits + m·prior) / (n + m)`` with the prior being the
    GLOBAL rate.  Exact-rational form: with prior = H/N the smoothed
    rate equals ``(hits·N + m·H) / (N·(n + m))`` — integer numerator
    and denominator kept in the output so callers CAN compare
    exactly.  The rank itself orders by the single correctly-rounded
    IEEE division ``sm_num / sm_den`` — the identical expression the
    oracle ranks on — so distinct exact rationals that round to the
    same double tie and fall to the group-key tiebreak; that is the
    documented contract, not a bug (an exact cross-multiplied sort
    key would need a pairwise comparison, which a sort key cannot
    express).

    Returns per group: ``*group_cols, n, hits, sm_num, sm_den,
    smoothed_rate, rank`` (rank 1 = highest smoothed rate; ties by
    group columns ascending).

    Scale: one hash aggregate + a one-row broadcast of the prior; the
    rank window orders the GROUP frame (bounded by group cardinality),
    not raw rows.
    """
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(hit_col).cast("long")).alias("hits"),
    )
    prior = agg.agg(
        F.sum("hits").alias("g_hits"), F.sum("n").alias("g_n")
    )
    scored = agg.crossJoin(F.broadcast(prior)).select(
        *group_cols,
        "n",
        "hits",
        (
            F.col("hits") * F.col("g_n") + F.lit(m) * F.col("g_hits")
        ).alias("sm_num"),
        (F.col("g_n") * (F.col("n") + F.lit(m))).alias("sm_den"),
    )
    w = Window.orderBy(
        F.desc(F.col("sm_num") / F.col("sm_den")),
        *[F.asc(c) for c in group_cols],
    )
    return scored.select(
        *group_cols,
        "n",
        "hits",
        "sm_num",
        "sm_den",
        (F.col("sm_num") / F.col("sm_den")).alias("smoothed_rate"),
        F.row_number().over(w).alias("rank"),
    )


def woe_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
) -> DataFrame:
    """Weight-of-evidence encoding per category with information-value
    contributions — the credit-scoring/feature-engineering standard
    for turning a high-cardinality categorical into one monotone
    numeric:

      WOE(c) = ln( P(c|pos) / P(c|neg) )
             = ln(pos_c) + ln(NEG) − ln(neg_c) − ln(POS)

    with add-one smoothing on every count (integer, so the inputs stay
    exact; a zero-count bucket gets a finite WOE instead of ±inf).
    The logs are ``portable_ln`` — cross-engine bit-exact on integer
    inputs — composed as ``(ln a + ln b) − (ln c + ln d)``, which also
    sidesteps the ``pos·NEG`` product overflow a literal ratio would
    hit at 100 TB counts.  IV contribution =
    ``(pos_c/POS − neg_c/NEG) · WOE`` (terminal doubles, op-order
    mirrored by the oracle).

    One hash aggregate + a one-row broadcast.  Returns
    ``{cat_col}, n, n_pos, n_neg, woe, iv_contrib``.
    """
    from db_factfinder_spark.functions.portable_math import portable_ln

    agg = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("n_pos"),
    )
    agg = agg.withColumn("n_neg", F.col("n") - F.col("n_pos"))
    tot = agg.agg(
        F.sum("n_pos").alias("t_pos"), F.sum("n_neg").alias("t_neg")
    )
    j = agg.crossJoin(F.broadcast(tot))
    woe = (
        portable_ln(F.col("n_pos") + 1) + portable_ln(F.col("t_neg") + 2)
    ) - (
        portable_ln(F.col("n_neg") + 1) + portable_ln(F.col("t_pos") + 2)
    )
    p_pos = (F.col("n_pos") + 1).cast("double") / (
        F.col("t_pos") + 2
    ).cast("double")
    p_neg = (F.col("n_neg") + 1).cast("double") / (
        F.col("t_neg") + 2
    ).cast("double")
    return j.select(
        cat_col,
        "n",
        "n_pos",
        "n_neg",
        woe.alias("woe"),
        ((p_pos - p_neg) * woe).alias("iv_contrib"),
    )
