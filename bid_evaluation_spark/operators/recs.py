"""Collaborative-filtering recommendations: item-item cosine neighbors.

Beyond-reference operator (classic item-based CF, Sarwar et al. WWW
2001): from an implicit-feedback interaction table (user, item), score
item pairs by the cosine of their binary user vectors

    cos(i, j) = |U_i ∩ U_j| / sqrt(|U_i| · |U_j|)

and keep each item's top-k neighbors — the precomputed similarity table
an online recommender serves lookups from.

100-TB shape: the quadratic step is per-user pair generation, bounded
by ``max_user_items``² after dropping power users (the same hub cap as
``graph.link_prediction`` / the basket operators — a crawler account
interacting with every item would otherwise create an all-pairs row
set).  One groupBy(user) for the cap, one pair-keyed partial-agg
groupBy for co-counts, two degree joins, one per-item window for the
top-k — no collect, no cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def item_item_cosine(interactions: DataFrame, user_col: str,
                     item_col: str, k: int = 10,
                     max_user_items: int = 256,
                     min_common: int = 2) -> DataFrame:
    """Top-k cosine-similar items per item → ``(item, neighbor, common,
    cosine, rnk)`` with rnk 1..k ordered by (cosine desc, neighbor asc)
    — deterministic under ties.  ``cosine`` rounds to 4 decimals BEFORE
    ranking so the order is reproducible across engines.

    Users with more than ``max_user_items`` distinct items are dropped
    entirely (hub cap; degrees count the capped table so the cosine
    stays a true cosine on the retained data).  Pairs sharing fewer
    than ``min_common`` users are pruned before ranking.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    inc = (interactions
           .select(F.col(user_col).alias("_u"), F.col(item_col).alias("_i"))
           .filter(F.col("_u").isNotNull() & F.col("_i").isNotNull())
           .distinct())
    kept = inc.join(
        inc.groupBy("_u").agg(F.count(F.lit(1)).alias("_sz"))
           .filter(F.col("_sz") <= max_user_items)
           .select("_u"),
        "_u")
    deg = kept.groupBy(F.col("_i").alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"))
    a = kept.select("_u", F.col("_i").alias("item"))
    b = kept.select("_u", F.col("_i").alias("neighbor"))
    co = (a.join(b, "_u")
          .filter(F.col("item") != F.col("neighbor"))
          .groupBy("item", "neighbor")
          .agg(F.count(F.lit(1)).cast("long").alias("common"))
          .filter(F.col("common") >= int(min_common)))
    di = deg.select(F.col("item"), F.col("n_users").alias("_ni"))
    dj = deg.select(F.col("item").alias("neighbor"),
                    F.col("n_users").alias("_nj"))
    cos = (F.round(F.col("common").cast("double")
                   / F.sqrt(F.col("_ni").cast("double")
                            * F.col("_nj").cast("double")) * 1e4) / 1e4
           + F.lit(0.0))
    w = Window.partitionBy("item").orderBy(F.desc("cosine"),
                                           F.asc("neighbor"))
    return (co.join(di, "item").join(dj, "neighbor")
            .withColumn("cosine", cos)
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("item", "neighbor", "common", "cosine", "rnk"))
