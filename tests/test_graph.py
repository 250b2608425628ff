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


def test_kcore_peel_laws(spark):
    """Peeling on a hand-built graph: a 4-clique (3-core) plus a pendant path
    — the path peels away, the clique survives with degree 3; the fixture
    round count reaches the fixpoint (an extra round changes nothing)."""
    from movie_genre_data_pipeline_spark.functions.graph import kcore_peel

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
         ("d", "e"), ("e", "f")],  # pendant path d-e-f
        "src string, dst string",
    )
    core = {r["node"]: r["core_degree"] for r in kcore_peel(edges, 3, 3).collect()}
    assert core == {"a": 3, "b": 3, "c": 3, "d": 3}
    # fixpoint: one more round changes nothing
    more = {r["node"]: r["core_degree"] for r in kcore_peel(edges, 3, 4).collect()}
    assert more == core
    # k above the max clique degree empties the graph
    assert kcore_peel(edges, 4, 3).count() == 0


def test_kcore_trade_reaches_fixpoint(spark):
    """The suite query's fixed round count is AT the fixpoint for the fixture
    (so the output is the true k-core, not a partial peel)."""
    from movie_genre_data_pipeline_spark.suite import all_queries
    from movie_genre_data_pipeline_spark.suite.graph_queries import (
        KCORE_K,
        KCORE_ROUNDS,
    )

    assert KCORE_ROUNDS >= 2
    rows = all_queries()["graph_kcore_trade"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    # every surviving node's degree meets the core threshold — the fixpoint
    # condition (a partial peel would leave some node under k)
    assert rows and all(r["core_degree"] >= KCORE_K for r in rows)
