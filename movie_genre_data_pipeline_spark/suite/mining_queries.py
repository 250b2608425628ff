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


# -- sequential patterns: the order-priority transition matrix (r7) -----------------------
# Basket mining (above) ignores ORDER; the sequential complement estimates the
# first-order Markov transition structure of each customer's order stream —
# P(next priority | current priority) — the session-flow / next-action model a
# behavioural pipeline fits. Plan shape: one LAG window per customer sequence
# (total order: o_orderdate, then o_orderkey for same-day ties), one hash
# aggregate over (prev, next) — |priorities|² output rows however large the
# fact side grows. Counts are exact integers; the row-normalized transition
# probability publishes micro-rounded from a shared expression.
def q_mine_priority_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    seq = o.select(
        "o_custkey",
        F.col("o_orderpriority").alias("nxt"),
        F.lag("o_orderpriority", 1).over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    counts = seq.groupBy("prev", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    totals = counts.groupBy("prev").agg(
        F.sum("n_transitions").cast("bigint").alias("n_from")
    )
    return counts.join(totals, "prev").selectExpr(
        "prev",
        "nxt",
        "n_transitions",
        "n_from",
        "CAST(ROUND(CAST(n_transitions AS DOUBLE) / n_from * 1000000) AS BIGINT)"
        " AS p_micro",
    )


Q_MINE_PRIORITY_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT o_custkey,
         o_orderpriority AS nxt,
         LAG(o_orderpriority, 1) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev
  FROM orders
),
counts AS (
  SELECT prev, nxt, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, nxt
),
totals AS (
  SELECT prev, CAST(SUM(n_transitions) AS BIGINT) AS n_from
  FROM counts GROUP BY prev
)
SELECT c.prev, c.nxt, c.n_transitions, t.n_from,
       CAST(ROUND(CAST(c.n_transitions AS DOUBLE) / t.n_from * 1000000) AS BIGINT)
         AS p_micro
FROM counts c JOIN totals t USING (prev)
"""


QUERIES["mine_priority_transitions"] = QuerySpec(
    q_mine_priority_transitions, Q_MINE_PRIORITY_TRANSITIONS_ORACLE
)
