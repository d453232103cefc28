"""Market-basket association rules: frequent pairs, confidence, lift.

Beyond-reference operator (no counterpart in ``/root/reference``): the
classic co-occurrence mining primitive (Agrawal & Srikant, VLDB 1994 —
the Apriori pruning lemma) over a ``(basket, item)`` long table, the
shape a recommendations / co-curation pipeline needs.

Scale design:

- The quadratic step (pairing items within a basket) is gated by the
  Apriori lemma: a pair can only reach ``min_count`` support if BOTH
  items do, so infrequent items are semi-joined away BEFORE the
  self-join. On heavy-tailed corpora this removes most of the long tail
  up front.
- The self-join keys on the basket id, so both sides hash-partition on
  the same key — one shuffle layout, reused by Spark for both inputs.
  Per-basket work is quadratic in basket SIZE only; ``max_basket_items``
  optionally drops pathological mega-baskets (a standard guard — a
  basket with 10⁵ items is telemetry noise, not signal).
- Support tables are bounded by the distinct-item count (dimension-
  sized); AQE broadcasts them back onto the pair table. The basket
  count is a 1-row aggregate cross-joined in — never a driver collect.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .cache import track_cached


def item_supports(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """Distinct-basket support per item → ``(item, n_baskets)``.
    Multiplicity within a basket is ignored (set semantics)."""
    return (_items(df, basket_col, item_col)
            .groupBy(F.col("_i").alias("item"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_baskets")))


def _items(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    return (df.filter(F.col(basket_col).isNotNull()
                      & F.col(item_col).isNotNull())
            .select(F.col(basket_col).alias("_b"),
                    F.col(item_col).alias("_i"))
            .distinct())


def association_rules(df: DataFrame, basket_col: str, item_col: str,
                      min_count: int = 2,
                      max_basket_items: Optional[int] = None) -> DataFrame:
    """Pairwise association rules over a ``(basket, item)`` long table →
    ``(antecedent, consequent, n_joint, n_antecedent, n_consequent,
    confidence, lift)`` for every ordered pair whose JOINT support
    reaches ``min_count``. Support = distinct baskets containing the
    item(set); ``confidence = n_joint / n_antecedent``;
    ``lift = n_joint · n_total_baskets / (n_antecedent · n_consequent)``
    (both rounded to 4 decimals, the repo's oracle contract).

    One distinct shuffle, one item-support groupBy (Apriori prune), one
    basket-keyed self-join + pair groupBy, then bounded support tables
    joined back. Null basket/item rows are excluded by contract.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    items = _items(df, basket_col, item_col)
    if max_basket_items is not None:
        sizes = (items.groupBy("_b")
                 .agg(F.count(F.lit(1)).alias("_sz"))
                 .filter(F.col("_sz") <= max_basket_items)
                 .select("_b"))
        items = items.join(sizes, "_b", "left_semi")
    # items feeds FOUR consumers (supports, both self-join sides, the
    # basket total) and supp three — persist both or the scan + distinct
    # shuffle replay per consumer (release via operators.cache.release)
    items = items.persist()
    supp = (items.groupBy("_i")
            .agg(F.count(F.lit(1)).cast("long").alias("_n"))).persist()
    freq = supp.filter(F.col("_n") >= min_count).select("_i")
    # Apriori lemma: pair support <= each member's support, so items
    # below min_count can never appear in a surviving pair — prune them
    # before the quadratic step.
    fitems = items.join(freq, "_i", "left_semi")

    a, b = fitems.alias("a"), fitems.alias("b")
    pairs = (a.join(b, (F.col("a._b") == F.col("b._b"))
                    & (F.col("a._i") < F.col("b._i")))
             .groupBy(F.col("a._i").alias("_ia"), F.col("b._i").alias("_ib"))
             .agg(F.count(F.lit(1)).cast("long").alias("_nj"))
             .filter(F.col("_nj") >= min_count))

    dirs = (pairs.select(F.col("_ia").alias("_ant"),
                         F.col("_ib").alias("_con"), "_nj")
            .unionByName(pairs.select(F.col("_ib").alias("_ant"),
                                      F.col("_ia").alias("_con"), "_nj")))

    nb = items.agg(F.count_distinct("_b").cast("long").alias("_ntot"))
    sa = supp.select(F.col("_i").alias("_ant"), F.col("_n").alias("_na"))
    sc = supp.select(F.col("_i").alias("_con"), F.col("_n").alias("_nc"))

    conf = F.col("_nj") / F.col("_na").cast("double")
    lift = ((F.col("_nj").cast("double") * F.col("_ntot"))
            / (F.col("_na").cast("double") * F.col("_nc")))
    out = (dirs.join(sa, "_ant").join(sc, "_con").crossJoin(F.broadcast(nb))
           .select(F.col("_ant").alias("antecedent"),
                   F.col("_con").alias("consequent"),
                   F.col("_nj").alias("n_joint"),
                   F.col("_na").alias("n_antecedent"),
                   F.col("_nc").alias("n_consequent"),
                   (F.round(conf * 1e4) / 1e4 + F.lit(0.0))
                   .alias("confidence"),
                   (F.round(lift * 1e4) / 1e4 + F.lit(0.0)).alias("lift")))
    return track_cached(out, [items, supp])


def frequent_triples(df: DataFrame, basket_col: str, item_col: str,
                     min_count: int = 2) -> DataFrame:
    """Level-3 Apriori: frequent item TRIPLES → ``(item_a, item_b,
    item_c, n_joint)`` with ``a < b < c`` and joint distinct-basket
    support ≥ ``min_count``.

    Candidate generation follows the Apriori lattice: only FREQUENT
    PAIRS extend (a frequent triple's every sub-pair is frequent, so
    extending (a,b) by items c > b from the same basket loses nothing),
    and the extending item itself must be frequent. Both prunes land
    before the widest join. All joins key on the basket id — the same
    single shuffle layout as :func:`association_rules`.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    items = _items(df, basket_col, item_col)
    supp = (items.groupBy("_i")
            .agg(F.count(F.lit(1)).alias("_n")))
    freq = supp.filter(F.col("_n") >= min_count).select("_i")
    fitems = items.join(freq, "_i", "left_semi").persist()

    a, b = fitems.alias("a"), fitems.alias("b")
    pairs = (a.join(b, (F.col("a._b") == F.col("b._b"))
                    & (F.col("a._i") < F.col("b._i")))
             .groupBy(F.col("a._i").alias("_ia"), F.col("b._i").alias("_ib"))
             .agg(F.count(F.lit(1)).alias("_np"))
             .filter(F.col("_np") >= min_count)
             .select("_ia", "_ib"))

    pair_occ = (fitems.alias("x")
                .join(fitems.alias("y"),
                      (F.col("x._b") == F.col("y._b"))
                      & (F.col("x._i") < F.col("y._i")))
                .select(F.col("x._b").alias("_b"),
                        F.col("x._i").alias("_ia"),
                        F.col("y._i").alias("_ib"))
                .join(pairs, ["_ia", "_ib"], "left_semi"))
    third = fitems.select(F.col("_b"), F.col("_i").alias("_ic"))
    out = (pair_occ.join(third, "_b")
           .filter(F.col("_ic") > F.col("_ib"))
           .groupBy(F.col("_ia").alias("item_a"),
                    F.col("_ib").alias("item_b"),
                    F.col("_ic").alias("item_c"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_joint"))
           .filter(F.col("n_joint") >= min_count))
    return track_cached(out, [fitems])
