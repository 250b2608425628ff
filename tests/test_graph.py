"""Graph-operator laws (functions/graph.py): PageRank symmetry/ordering on
hand-checkable graphs, fixed-point determinism, and exact triangle censuses."""

from __future__ import annotations

import pytest

from movie_genre_data_pipeline_spark.functions.graph import (
    pagerank_fixed_point,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_cycle_is_uniform(spark):
    # 3-cycle: perfect symmetry -> identical ranks, preserved every iteration
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    ranks = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(e).collect()}
    assert len(set(ranks.values())) == 1
    assert ranks["a"] == pytest.approx(1e12 / 3, rel=1e-3)


def test_pagerank_star_center_dominates(spark):
    # all spokes point at the hub; hub rank must exceed every spoke's
    e = _edges(spark, [(s, "hub") for s in ("s1", "s2", "s3", "s4")])
    ranks = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(e).collect()}
    assert all(ranks["hub"] > ranks[s] for s in ("s1", "s2", "s3", "s4"))
    # the hub is dangling: its mass is dropped by contract, so totals < scale
    assert sum(ranks.values()) < 1e12


def test_pagerank_trajectory_is_run_stable(spark):
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"), ("c", "d")],
    )
    one = sorted((r["node"], r["rank_fp"]) for r in pagerank_fixed_point(e).collect())
    two = sorted((r["node"], r["rank_fp"]) for r in pagerank_fixed_point(e).collect())
    assert one == two  # integral fixed-point values, bit-stable across runs


def test_triangle_count_known_graphs(spark):
    # K4 has C(4,3) = 4 triangles; direction/duplication/self-loops must not matter
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    noisy = k4 + [("b", "a"), ("c", "c"), ("a", "b")]
    row = triangle_count(_edges(spark, noisy)).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 6, 4)
    # a path has none
    row = triangle_count(_edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])).collect()[0]
    assert row["n_triangles"] == 0 and row["n_edges"] == 3
