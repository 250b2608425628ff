"""Count-Min sketch contract: never undercounts, grid size bounded by d×w
regardless of key cardinality, estimates are exact when no collision occurs,
mergeable by cell-wise addition, probe stays broadcast-only, and mismatched
probe params fail loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.cms import build_cms, cms_estimate

W, D = 64, 3


def _occurrences(spark, spec: dict[str, int]):
    rows = [(k,) for k, n in spec.items() for _ in range(n)]
    return spark.createDataFrame(rows, "item string")


def test_never_undercounts_and_grid_bounded(spark):
    spec = {f"k{i}": (i % 7) + 1 for i in range(200)}  # 200 keys >> 64 cols
    items = _occurrences(spark, spec)
    cms = build_cms(items, "item", W, D).localCheckpoint()
    assert cms.count() <= W * D
    vocab = items.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(vocab, "item", cms, W, D).collect()
    assert len(est) == 200
    for r in est:
        assert r.cms_est >= r.n, (r.item, r.n, r.cms_est)


def test_exact_when_no_collisions(spark):
    spec = {"a": 5, "b": 3, "c": 11}  # 3 keys in 64 cols: collisions ~0
    items = _occurrences(spark, spec)
    cms = build_cms(items, "item", 1024, D).localCheckpoint()
    vocab = items.select("item").distinct()
    got = {
        r.item: r.cms_est
        for r in cms_estimate(vocab, "item", cms, 1024, D).collect()
    }
    assert got == spec


def test_mergeable_by_cellwise_addition(spark):
    """Two sketches over disjoint halves, unioned and re-summed per cell, must
    equal the sketch of the whole stream — the property that lets daily grids
    merge into monthly ones without touching raw data."""
    s1, s2 = {"a": 4, "b": 2}, {"a": 1, "c": 7}
    g1 = build_cms(_occurrences(spark, s1), "item", W, D)
    g2 = build_cms(_occurrences(spark, s2), "item", W, D)
    merged = (
        g1.unionByName(g2)
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = build_cms(
        _occurrences(spark, {"a": 5, "b": 2, "c": 7}), "item", W, D
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_weighted_build(spark):
    weighted = spark.createDataFrame([("a", 5), ("b", 3)], "item string, w int")
    cms = build_cms(weighted, "item", 1024, D, weight_col="w").localCheckpoint()
    got = {
        r.item: r.cms_est
        for r in cms_estimate(
            weighted.select("item"), "item", cms, 1024, D
        ).collect()
    }
    assert got == {"a": 5, "b": 3}


def test_probe_plan_is_broadcast_only(spark):
    items = _occurrences(spark, {"a": 2, "b": 1})
    cms = build_cms(items, "item", W, D).localCheckpoint()
    plan = (
        cms_estimate(items.distinct(), "item", cms, W, D)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_param_mismatch_raises(spark):
    items = _occurrences(spark, {"a": 1})
    cms = build_cms(items, "item", W, D).localCheckpoint()
    with pytest.raises(ValueError, match="width"):
        cms_estimate(items, "item", cms, W * 2, D)
    with pytest.raises(ValueError, match="width"):
        cms_estimate(items, "item", cms, W, D + 1)
    with pytest.raises(ValueError):
        build_cms(items, "item", 0, 3)
