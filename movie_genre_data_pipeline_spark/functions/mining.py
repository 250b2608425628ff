"""Market-basket mining: co-occurrence pair supports and association rules.

The reference's analytic target is "which genres does a movie carry" (the
exploded Genres_Id array, reference: Movie_notebook/Bronze_to_Silver.py) — the
natural next question over any multi-label catalog is which labels CO-OCCUR
and with what lift. The same operators drive corpus analytics (which sources
co-appear in a dedup cluster, which domains co-cite).

Scale shape — this is the part that matters at 100 TB:

- Baskets are first DISTINCT-reduced to (basket, item): one shuffle on the
  composite key with map-side partial aggregation.
- Pair generation is a SELF-JOIN ON THE BASKET KEY with ``item_a < item_b``.
  This is NOT a cross join: both sides shuffle-partition on the basket id, and
  each task emits at most C(k, 2) pairs per basket where k is that basket's
  item count. Output volume is Σ_baskets C(k_b, 2) — bounded by the basket-size
  distribution, not by n². A pathological mega-basket is a skew problem, not a
  plan problem: cap it upstream (filter k_b ≤ K, the standard FP-growth
  preprocessing step) or salt it (operators/skew.py).
- Supports/confidence/lift then reduce to the ITEM-VOCABULARY size — pair
  statistics join against two broadcast-sized single-item support tables.

All counts are integral; confidence and lift are single divisions rounded at a
fixed scale, so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_items(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """Distinct (basket, item) pairs — presence, not multiplicity (standard
    market-basket semantics)."""
    return df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()


def pair_supports(items: DataFrame) -> DataFrame:
    """Co-occurrence counts: (item_a < item_b, pair_support) via the
    basket-key self-join. ``items`` must already be distinct (basket, item)."""
    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    return (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("bigint").alias("pair_support"))
    )


def association_rules(
    items: DataFrame,
    pairs: DataFrame | None = None,
    min_support: int = 1,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Directed rules antecedent→consequent with support, confidence, lift.

    confidence = supp(a,b) / supp(a);  lift = n_baskets · supp(a,b) /
    (supp(a) · supp(b)). Thresholds are applied to the RAW ratios before
    rounding, so an oracle filtering the same way selects the same rows.
    """
    if pairs is None:
        pairs = pair_supports(items)
    singles = items.groupBy("item").agg(
        F.count("*").cast("bigint").alias("item_support")
    )
    # basket count stays a LAZY one-row frame broadcast into the rule stream —
    # no driver-side action, the whole computation remains one declarative plan
    n_b = items.select(
        F.count_distinct(F.col("basket")).cast("bigint").alias("__nb")
    )
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_support",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_support",
        )
    )
    sa = singles.select(
        F.col("item").alias("antecedent"), F.col("item_support").alias("__sa")
    )
    sb = singles.select(
        F.col("item").alias("consequent"), F.col("item_support").alias("__sb")
    )
    conf = F.col("pair_support").cast("double") / F.col("__sa").cast("double")
    lift = (
        F.col("pair_support").cast("double")
        * F.col("__nb")
        / (F.col("__sa").cast("double") * F.col("__sb").cast("double"))
    )
    return (
        directed.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sb), "consequent")
        .crossJoin(F.broadcast(n_b))
        .filter(
            (F.col("pair_support") >= min_support) & (conf >= F.lit(min_confidence))
        )
        .select(
            "antecedent",
            "consequent",
            F.col("pair_support").alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
    )


def triple_supports(items: DataFrame) -> DataFrame:
    """3-itemset co-occurrence counts via two basket-key self-joins with the
    total item order (a < b < c) — each triple counted once, output bounded by
    Σ_baskets C(k_b, 3). The same plan discipline as pairs: every join is on
    the basket key, never a cross join; mega-baskets are capped upstream."""
    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    c = items.select("basket", F.col("item").alias("item_c"))
    return (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .join(c, "basket")
        .filter(F.col("item_b") < F.col("item_c"))
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count("*").cast("bigint").alias("triple_support"))
    )
