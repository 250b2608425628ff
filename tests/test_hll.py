"""HyperLogLog register/estimate properties: accuracy inside the published
bound, mergeability (the property Spark's approx_count_distinct doesn't expose
as data), and partition invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.hll import (
    hll_estimate,
    hll_registers,
)


def _ids(spark, lo, hi, label):
    return spark.range(lo, hi).select(
        F.lit(label).alias("grp"), F.col("id").cast("string").alias("key")
    )


def test_hll_estimate_within_published_error(spark):
    # 1.04/sqrt(256) ~ 6.5% stddev; allow 4 sigma on a single draw.
    for n in (500, 5_000, 50_000):
        df = _ids(spark, 0, n, "a")
        est = hll_estimate(hll_registers(df, "key", ["grp"]), ["grp"]).collect()[0]
        assert abs(est["hll_est"] - n) / n < 0.26, (n, est["hll_est"])


def test_hll_registers_merge_equals_union(spark):
    """union-then-sketch == sketch-then-merge (union + re-max): the mergeable-
    across-days/datasets contract from the module docstring."""
    a = _ids(spark, 0, 3_000, "g")
    b = _ids(spark, 2_000, 6_000, "g")  # overlapping key ranges
    direct = hll_registers(a.unionByName(b), "key", ["grp"])
    merged = (
        hll_registers(a, "key", ["grp"])
        .unionByName(hll_registers(b, "key", ["grp"]))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_partition_invariant(spark):
    df = _ids(spark, 0, 10_000, "g")
    r1 = hll_estimate(hll_registers(df, "key", ["grp"]), ["grp"]).collect()
    r2 = hll_estimate(
        hll_registers(df.repartition(7), "key", ["grp"]), ["grp"]
    ).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_hll_duplicates_do_not_change_registers(spark):
    df = _ids(spark, 0, 1_000, "g")
    tripled = df.unionByName(df).unionByName(df)
    assert sorted(map(tuple, hll_registers(df, "key", ["grp"]).collect())) == sorted(
        map(tuple, hll_registers(tripled, "key", ["grp"]).collect())
    )


def test_hll_p_out_of_range_raises(spark):
    df = _ids(spark, 0, 10, "g")
    with pytest.raises(ValueError):
        hll_registers(df, "key", ["grp"], p=2)
    with pytest.raises(ValueError):
        hll_estimate(df, ["grp"], p=20)
