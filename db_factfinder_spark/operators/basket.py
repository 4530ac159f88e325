"""Market-basket association rules — support / confidence / lift over
co-occurring items within a transaction key (the Apriori 2-itemset
stage, Agrawal & Srikant VLDB'94, as pure DataFrame ops).

Scale shape mirrors collocation mining: the item vocabulary is pruned
by minimum support BEFORE the basket self-join, so a basket of b
surviving items contributes C(b, 2) pairs — bounded by basket size,
never by catalog size — and the join itself is an equi-join on the
transaction key.  Statistics are exact-integer ratios (one IEEE
division each), so any engine reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    k: int = 25,
) -> DataFrame:
    """Top-``k`` 2-item association rules x→y ranked by lift.

    support  = baskets containing BOTH x and y (presence, not
               multiplicity);
    conf     = support / baskets(x)   (exact-int ratio);
    lift     = support·N / (baskets(x)·baskets(y)).

    Items below ``min_support`` basket-count are pruned before the
    pair join (Apriori monotonicity: a pair can never out-support its
    rarest item).  Rules are emitted in BOTH directions (x→y and
    y→x share support and lift but not confidence).

    Plan: presence distinct → item counts (broadcast) → semi-join
    prune → basket self-join → pair counts → broadcast stat joins →
    TakeOrdered.  Ranking ties break on (antecedent, consequent).

    Output: ``antecedent, consequent, support, n_ante, n_cons,
    confidence, lift, rank``.
    """
    presence = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    counts = presence.groupBy("i").agg(F.count(F.lit(1)).alias("c"))
    frequent = counts.filter(F.col("c") >= min_support)
    pruned = presence.join(
        F.broadcast(frequent.select("i")), "i", "left_semi"
    )
    n_baskets = presence.select(
        F.countDistinct("b").alias("n_baskets")
    )
    a = pruned.select("b", F.col("i").alias("x"))
    bb = pruned.select("b", F.col("i").alias("y"))
    pairs = (
        a.join(bb, "b")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    # both rule directions from each unordered pair
    rules = pairs.select(
        F.col("x").alias("antecedent"),
        F.col("y").alias("consequent"),
        "support",
    ).unionByName(
        pairs.select(
            F.col("y").alias("antecedent"),
            F.col("x").alias("consequent"),
            "support",
        )
    )
    ca = frequent.select(
        F.col("i").alias("antecedent"), F.col("c").alias("n_ante")
    )
    cc = frequent.select(
        F.col("i").alias("consequent"), F.col("c").alias("n_cons")
    )
    scored = (
        rules.join(F.broadcast(ca), "antecedent")
        .join(F.broadcast(cc), "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .withColumn(
            "confidence",
            F.col("support").cast("double") / F.col("n_ante").cast("double"),
        )
        .withColumn(
            "lift",
            (F.col("support") * F.col("n_baskets")).cast("double")
            / (F.col("n_ante") * F.col("n_cons")).cast("double"),
        )
    )
    order = [
        F.col("lift").desc(),
        F.col("antecedent").asc(),
        F.col("consequent").asc(),
    ]
    return (
        scored.orderBy(*order)
        .limit(k)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .select(
            "antecedent", "consequent", "support", "n_ante", "n_cons",
            "confidence", "lift", "rank",
        )
    )


def rfm_scores(
    orders: DataFrame,
    cust_col: str,
    date_col: str,
    amount_c_col: str,
    ref_date,
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintile
    scores, the classic CRM 555-to-111 coding) — scale-correct: the
    quintile boundaries come from ONE exact-percentile aggregate that
    broadcasts as a single row, and every score is then a map-side
    comparison.  The textbook ``ntile(5)`` formulation globally sorts
    all customers through one partition; boundary-broadcast assigns
    identical-at-the-boundary-ties-aside buckets with no global sort
    (ties ON a boundary all land in the lower bucket — deterministic,
    and both engines interpolate identical percentile operands, per
    the q59 parity precedent).

    Scores are 1–5 with 5 best: most recent, most frequent, highest
    spend.  Output: ``cust_col, r_days, f, m_c, r_score, f_score,
    m_score, rfm`` (rfm = concatenated digit string).
    """
    per_c = orders.groupBy(cust_col).agg(
        F.datediff(
            F.lit(ref_date).cast("date"), F.to_date(F.max(date_col))
        ).alias("r_days"),
        F.count(F.lit(1)).alias("f"),
        F.sum(amount_c_col).alias("m_c"),
    )
    bounds = per_c.agg(
        F.expr("percentile(r_days, array(0.2, 0.4, 0.6, 0.8))").alias("rb"),
        F.expr("percentile(f, array(0.2, 0.4, 0.6, 0.8))").alias("fb"),
        F.expr("percentile(m_c, array(0.2, 0.4, 0.6, 0.8))").alias("mb"),
    )

    def bucket(v: str, b: str):
        x = F.col(v).cast("double")
        s = F.lit(1)
        for i in range(4):
            s = s + F.when(x > F.get(F.col(b), i), 1).otherwise(0)
        return s

    scored = per_c.crossJoin(F.broadcast(bounds)).select(
        cust_col,
        "r_days",
        "f",
        "m_c",
        # small recency = recently active = best
        (F.lit(6) - bucket("r_days", "rb")).alias("r_score"),
        bucket("f", "fb").alias("f_score"),
        bucket("m_c", "mb").alias("m_score"),
    )
    return scored.withColumn(
        "rfm",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    rating_col: str,
    min_co: int = 2,
    k: int = 25,
) -> DataFrame:
    """Top-``k`` item pairs by multiplicity-weighted cosine² — the
    item-item collaborative-filtering neighborhood (Sarwar et al.,
    WWW'01) over rating vectors indexed by basket.

    Where ``association_rules`` counts mere presence, this treats
    each item as the sparse vector of its per-basket rating sums and
    scores pairs by vector-space cosine.  To avoid a runtime sqrt
    (libm, not bit-portable) the SQUARE of the cosine is reported —
    monotone in cosine for non-negative ratings, so the ranking is
    identical:

        cos²(x,y) = (Σ_b r_bx·r_by)² / (Σ_b r_bx² · Σ_b r_by²)

    with every sum an exact long and ONE IEEE division at the end.

    Plan: groupBy to the (basket, item, rating) grain → self-equi-join
    on the basket key with ``item_x < item_y`` (a basket of b items
    yields C(b,2) pairs — bounded by basket size, never catalog
    size) → pair dot-product groupBy → two broadcast joins against
    the (small) per-item norm table → TakeOrdered.  Pairs co-occurring
    in fewer than ``min_co`` baskets are dropped before scoring.

    Output: ``item_x, item_y, n_co, dot, cos2`` — top ``k`` by
    (cos2 desc, item_x, item_y).
    """
    ratings = df.groupBy(basket_col, item_col).agg(
        F.sum(rating_col).cast("long").alias("r")
    )
    norms = ratings.groupBy(item_col).agg(
        F.sum(F.col("r") * F.col("r")).alias("norm2")
    )
    lhs = ratings.select(
        F.col(basket_col).alias("__b"),
        F.col(item_col).alias("item_x"),
        F.col("r").alias("rx"),
    )
    rhs = ratings.select(
        F.col(basket_col).alias("__b"),
        F.col(item_col).alias("item_y"),
        F.col("r").alias("ry"),
    )
    pairs = (
        lhs.join(rhs, "__b")
        .filter(F.col("item_x") < F.col("item_y"))
        .groupBy("item_x", "item_y")
        .agg(
            F.count(F.lit(1)).alias("n_co"),
            F.sum(F.col("rx") * F.col("ry")).alias("dot"),
        )
        .filter(F.col("n_co") >= min_co)
    )
    from pyspark.sql.functions import broadcast

    scored = (
        pairs.join(
            broadcast(norms.select(F.col(item_col).alias("item_x"),
                                   F.col("norm2").alias("nx2"))),
            "item_x",
        )
        .join(
            broadcast(norms.select(F.col(item_col).alias("item_y"),
                                   F.col("norm2").alias("ny2"))),
            "item_y",
        )
        .select(
            "item_x",
            "item_y",
            "n_co",
            "dot",
            (
                (F.col("dot") * F.col("dot")).cast("double")
                / (F.col("nx2") * F.col("ny2")).cast("double")
            ).alias("cos2"),
        )
    )
    return scored.orderBy(
        F.desc("cos2"), "item_x", "item_y"
    ).limit(k)
