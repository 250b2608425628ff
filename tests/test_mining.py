"""Market-basket mining (functions/mining.py): hand-checked supports,
confidence and lift arithmetic, presence semantics, and the pair-volume bound."""

from __future__ import annotations

from math import comb

from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.mining import (
    association_rules,
    basket_items,
    pair_supports,
)

# b1:{A,B,C} b2:{A,B} b3:{B,C} b4:{A}
_ROWS = [
    (1, "A"), (1, "B"), (1, "C"),
    (2, "A"), (2, "B"),
    (3, "B"), (3, "C"),
    (4, "A"),
]


def _items(spark, rows=_ROWS):
    return basket_items(
        spark.createDataFrame(rows, ["basket", "item"]), "basket", "item"
    )


def test_pair_supports_hand_checked(spark):
    pairs = {
        (r.item_a, r.item_b): r.pair_support
        for r in pair_supports(_items(spark)).collect()
    }
    assert pairs == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 2}


def test_presence_not_multiplicity(spark):
    dup = _ROWS + [(1, "A"), (1, "A"), (2, "B")]
    pairs = {
        (r.item_a, r.item_b): r.pair_support
        for r in pair_supports(_items(spark, dup)).collect()
    }
    assert pairs == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 2}


def test_rules_confidence_and_lift_arithmetic(spark):
    rules = {
        (r.antecedent, r.consequent): (r.support, r.confidence, r.lift)
        for r in association_rules(_items(spark)).collect()
    }
    # supp A=3, B=3, C=2, n=4
    assert rules[("A", "B")] == (2, round(2 / 3, 6), round(4 * 2 / (3 * 3), 6))
    assert rules[("B", "A")] == (2, round(2 / 3, 6), round(4 * 2 / (3 * 3), 6))
    assert rules[("C", "B")] == (2, 1.0, round(4 * 2 / (2 * 3), 6))
    assert rules[("A", "C")] == (1, round(1 / 3, 6), round(4 * 1 / (3 * 2), 6))
    # both directions of every surviving pair are present
    assert len(rules) == 6


def test_rule_thresholds_filter_raw_ratios(spark):
    rules = association_rules(_items(spark), min_support=2, min_confidence=0.75)
    got = {(r.antecedent, r.consequent) for r in rules.collect()}
    # conf: A→B 2/3, B→A 2/3, B→C 2/3, C→B 2/2 — only C→B clears 0.75
    assert got == {("C", "B")}


def test_pair_volume_matches_basket_size_bound(spark):
    items = _items(spark)
    sizes = items.groupBy("basket").count().collect()
    expected = sum(comb(r["count"], 2) for r in sizes)
    total_pairs = (
        pair_supports(items).agg(F.sum("pair_support").alias("s")).collect()[0].s
    )
    assert total_pairs == expected


def test_triple_supports_hand_checked_and_bounded(spark):
    from math import comb

    from movie_genre_data_pipeline_spark.functions.mining import triple_supports

    items = _items(spark)  # b1:{A,B,C} is the only basket with >= 3 items
    triples = {
        (r.item_a, r.item_b, r.item_c): r.triple_support
        for r in triple_supports(items).collect()
    }
    assert triples == {("A", "B", "C"): 1}
    sizes = items.groupBy("basket").count().collect()
    assert sum(triples.values()) == sum(comb(r["count"], 3) for r in sizes)
