"""Histogram-quantile sketch properties: error bounded by one bin width,
mergeability, edge-bin clamping, first-crossing-bin selection (the negative-
extrapolation hazard), and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from movie_genre_data_pipeline_spark.functions.quantiles import (
    build_histogram,
    histogram_quantiles,
)


def test_histogram_quantiles_within_bin_width(spark):
    # uniform 0..1000 over [0, 1000) with 100 bins: width 10
    df = spark.range(0, 1000).select(
        F.lit("g").alias("grp"), F.col("id").cast("double").alias("v")
    )
    hist = build_histogram(df, "v", 0.0, 1000.0, 100, ["grp"])
    est = histogram_quantiles(
        hist, (0.5, 0.9, 0.99), 0.0, 1000.0, 100, ["grp"]
    ).collect()[0]
    exact = df.agg(
        F.expr("percentile(v, 0.5)").alias("p50"),
        F.expr("percentile(v, 0.9)").alias("p90"),
        F.expr("percentile(v, 0.99)").alias("p99"),
    ).collect()[0]
    assert est["n"] == 1000
    for hq, p in (("hq50", "p50"), ("hq90", "p90"), ("hq99", "p99")):
        assert abs(est[hq] - exact[p]) <= 10.0, (hq, est[hq], exact[p])


def test_histogram_merge_equals_union(spark):
    a = spark.range(0, 500).select(F.col("id").cast("double").alias("v"))
    b = spark.range(300, 900).select(F.col("id").cast("double").alias("v"))
    direct = build_histogram(a.unionByName(b), "v", 0.0, 1000.0, 50)
    merged = (
        build_histogram(a, "v", 0.0, 1000.0, 50)
        .unionByName(build_histogram(b, "v", 0.0, 1000.0, 50))
        .groupBy("bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, merged.collect()))


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [Row(v=-50.0), Row(v=0.0), Row(v=99.0), Row(v=250.0), Row(v=None)]
    )
    hist = {r["bin"]: r["cnt"] for r in build_histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert hist == {0: 2, 9: 2}  # -50 clamps to bin 0, 250 to bin 9, NULL dropped


def test_histogram_quantile_picks_first_crossing_bin(spark):
    # 100 values in bin 0, then 1 value far away in bin 50: the median must
    # interpolate inside bin 0, not take bin 50's negative extrapolation.
    rows = [Row(v=0.5)] * 100 + [Row(v=50.5)]
    df = spark.createDataFrame(rows)
    hist = build_histogram(df, "v", 0.0, 100.0, 100)
    est = histogram_quantiles(hist, (0.5,), 0.0, 100.0, 100).collect()[0]
    assert 0.0 < est["hq50"] <= 1.0, est["hq50"]


def test_histogram_validation(spark):
    df = spark.createDataFrame([Row(v=1.0)])
    with pytest.raises(ValueError):
        build_histogram(df, "v", 0.0, 100.0, 0)
    with pytest.raises(ValueError):
        build_histogram(df, "v", 5.0, 5.0, 10)
    hist = build_histogram(df, "v", 0.0, 100.0, 10)
    with pytest.raises(ValueError):
        histogram_quantiles(hist, (), 0.0, 100.0, 10)
    with pytest.raises(ValueError):
        histogram_quantiles(hist, (0.0,), 0.0, 100.0, 10)
