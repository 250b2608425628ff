"""Z-order layout contract: the Morton encoding matches a bit-by-bit Python
reference, grid scaling is integer-exact at the edges, and `write_zordered`
produces files whose z-ranges are pairwise disjoint (the property parquet
min/max pruning relies on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.operators.layout import (
    scale_to_grid,
    with_zvalue,
    write_zordered,
    zvalue,
)
from movie_genre_data_pipeline_spark.sources.batch import read_parquet

SF_DIR = "/root/testdata/sf0.001"


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_bitwise_reference(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 1), (65535, 65535), (40000, 123)]
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == _morton_ref(x, y), (x, y)


def test_scale_to_grid_exact_edges(spark):
    df = spark.createDataFrame([(0,), (500,), (1000,)], "v long")
    out = df.select(
        "v",
        scale_to_grid(F.col("v"), F.lit(0), F.lit(1000), bits=16).alias("g"),
    ).collect()
    by_v = {r.v: r.g for r in out}
    assert by_v[0] == 0
    assert by_v[1000] == 65535  # max maps exactly to the top cell
    assert by_v[500] == (500 * 65535) // 1000
    # degenerate range: everything in cell 0
    deg = df.select(scale_to_grid(F.col("v"), F.lit(7), F.lit(7)).alias("g")).collect()
    assert all(r.g == 0 for r in deg)


def test_write_zordered_files_cover_disjoint_z_ranges(spark, tmp_path):
    li = read_parquet(spark, f"{SF_DIR}/lineitem.parquet")
    out = str(tmp_path / "zordered")
    write_zordered(li, out, "l_partkey", "l_suppkey", num_files=8)
    back = read_parquet(spark, out)
    assert back.count() == li.count()
    # Recompute z on the round-tripped rows; min/max come from the same data so
    # the grid is identical. Group per physical file.
    tagged = back.withColumn("f", F.input_file_name())
    ranges = (
        with_zvalue(tagged, "l_partkey", "l_suppkey", out_col="z")
        .groupBy("f")
        .agg(F.min("z").alias("zmin"), F.max("z").alias("zmax"))
        .collect()
    )
    assert 1 < len(ranges) <= 8
    ivals = sorted((r.zmin, r.zmax) for r in ranges)
    for (_, hi), (lo, _) in zip(ivals, ivals[1:]):
        assert hi <= lo, f"overlapping file z-ranges: {ivals}"


def test_zorder_stats_plan_has_no_shuffle_join(spark):
    from movie_genre_data_pipeline_spark.suite.layout_queries import q_zorder_stats

    plan = (
        q_zorder_stats(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    )
    # stats row joins via broadcast; no shuffle join anywhere
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_scale_to_grid_rejects_overflowing_range(spark):
    """Ranges wider than 2^47 would overflow the BIGINT grid numerator; the
    expression raises instead of silently wrapping (ADVICE r2)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(0,), (1 << 48,)], "v long")
    expr = scale_to_grid(F.col("v"), F.lit(0), F.lit(1 << 48))
    with pytest.raises(SparkRuntimeException):
        df.select(expr.alias("g")).collect()


def test_scale_to_grid_exact_beyond_double_precision(spark):
    """True integer division: exact even where double division rounds wrong
    (numerators above 2^53). Range just under the 2^47 guard."""
    lo, hi = 0, (1 << 47) - 1
    v = hi - 3
    df = spark.createDataFrame([(v,)], "v long")
    [r] = df.select(
        scale_to_grid(F.col("v"), F.lit(lo), F.lit(hi)).alias("g")
    ).collect()
    assert r.g == (v * 65535) // hi
