"""Market-basket mining queries (functions/mining.py) over TPC-H order
baskets: brand co-occurrence supports and directed association rules.

Basket = an order; item = the brand of a part it contains (the lineitem →
part attribution is a broadcast dim join, the same star shape as
gold_genre_revenue). Baskets carry ≤ ~11 distinct brands, so the basket-key
self-join emits ≤ C(11,2) pairs per order — the plan's output is bounded by
the basket-size distribution, never by |orders|² (see functions/mining.py for
the 100 TB discussion).

Determinism: supports are integers; confidence/lift are single divisions with
identical operand order on both engines, thresholded on the RAW ratio and
rounded only for output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.mining import (
    association_rules,
    basket_items,
    pair_supports,
)
from movie_genre_data_pipeline_spark.suite import QuerySpec, load

PAIR_MIN_SUPPORT = 2
RULE_MIN_SUPPORT = 5
RULE_MIN_CONFIDENCE = 0.15

_ITEMS_CTE = """items AS (
  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_support
  FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
  GROUP BY a.item, b.item
)"""


def _brand_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    attributed = li.select("l_orderkey", "l_partkey").join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return basket_items(attributed, "l_orderkey", "p_brand")


def q_mine_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which brands co-occur in an order, and how often."""
    pairs = pair_supports(_brand_items(spark, sf_dir))
    return pairs.filter(F.col("pair_support") >= PAIR_MIN_SUPPORT).select(
        F.col("item_a").alias("brand_a"),
        F.col("item_b").alias("brand_b"),
        "pair_support",
    )


Q_MINE_BRAND_PAIRS_ORACLE = f"""
WITH {_ITEMS_CTE}
SELECT item_a AS brand_a, item_b AS brand_b, pair_support
FROM pairs WHERE pair_support >= {PAIR_MIN_SUPPORT}
"""


def q_mine_brand_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed rules brand_a → brand_b with support, confidence, lift."""
    items = _brand_items(spark, sf_dir)
    return association_rules(
        items,
        min_support=RULE_MIN_SUPPORT,
        min_confidence=RULE_MIN_CONFIDENCE,
    )


Q_MINE_BRAND_RULES_ORACLE = f"""
WITH {_ITEMS_CTE},
singles AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS item_support FROM items GROUP BY item
), nb AS (
  SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM items
), directed AS (
  SELECT item_a AS antecedent, item_b AS consequent, pair_support FROM pairs
  UNION ALL
  SELECT item_b AS antecedent, item_a AS consequent, pair_support FROM pairs
)
SELECT d.antecedent, d.consequent, d.pair_support AS support,
       ROUND(CAST(d.pair_support AS DOUBLE) / CAST(sa.item_support AS DOUBLE), 6)
         AS confidence,
       ROUND(CAST(d.pair_support AS DOUBLE) * nb.n
             / (CAST(sa.item_support AS DOUBLE) * CAST(sb.item_support AS DOUBLE)),
             6) AS lift
FROM directed d
JOIN singles sa ON sa.item = d.antecedent
JOIN singles sb ON sb.item = d.consequent
CROSS JOIN nb
WHERE d.pair_support >= {RULE_MIN_SUPPORT}
  AND CAST(d.pair_support AS DOUBLE) / CAST(sa.item_support AS DOUBLE)
      >= {RULE_MIN_CONFIDENCE}
"""


QUERIES: dict[str, QuerySpec] = {
    "mine_brand_pairs": QuerySpec(q_mine_brand_pairs, Q_MINE_BRAND_PAIRS_ORACLE),
    "mine_brand_rules": QuerySpec(q_mine_brand_rules, Q_MINE_BRAND_RULES_ORACLE),
}


TRIPLE_MIN_SUPPORT = 3


def q_mine_brand_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets — the next rung of the itemset lattice, mined with
    the same basket-key join discipline (two self-joins, a < b < c)."""
    from movie_genre_data_pipeline_spark.functions.mining import triple_supports

    triples = triple_supports(_brand_items(spark, sf_dir))
    return triples.filter(
        F.col("triple_support") >= TRIPLE_MIN_SUPPORT
    ).select(
        F.col("item_a").alias("brand_a"),
        F.col("item_b").alias("brand_b"),
        F.col("item_c").alias("brand_c"),
        "triple_support",
    )


Q_MINE_BRAND_TRIPLES_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT a.item AS brand_a, b.item AS brand_b, c.item AS brand_c,
       CAST(COUNT(*) AS BIGINT) AS triple_support
FROM items a
JOIN items b ON a.basket = b.basket AND a.item < b.item
JOIN items c ON b.basket = c.basket AND b.item < c.item
GROUP BY a.item, b.item, c.item
HAVING COUNT(*) >= {TRIPLE_MIN_SUPPORT}
"""


QUERIES["mine_brand_triples"] = QuerySpec(
    q_mine_brand_triples, Q_MINE_BRAND_TRIPLES_ORACLE
)
