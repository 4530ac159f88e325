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
