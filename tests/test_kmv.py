"""KMV bottom-k sketch properties: estimate accuracy, the small-set exact
regime, sketch mergeability, and partition invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.kmv import (
    kmv_pair_estimates,
    kmv_sketch,
)


def _sets(spark, spec):
    """spec: {group: (lo, hi)} -> DataFrame of (grp, key) integer ranges."""
    dfs = [
        spark.range(lo, hi).select(
            F.lit(g).alias("grp"), F.col("id").cast("string").alias("key")
        )
        for g, (lo, hi) in spec.items()
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def test_kmv_overlap_estimate_accuracy(spark):
    # |a|=8000, |b|=8000, overlap 4000 -> J = 4000/12000 = 1/3
    df = _sets(spark, {"a": (0, 8000), "b": (4000, 12000)})
    sk = kmv_sketch(df, "key", ["grp"], k=256)
    est = kmv_pair_estimates(sk, "grp", k=256).collect()[0]
    assert est["ga"] == "a" and est["gb"] == "b"
    # k=256 -> ~6% stddev on J; allow 4 sigma
    assert abs(est["jaccard_est"] - 1 / 3) < 0.09
    assert abs(est["union_est"] - 12000) / 12000 < 0.26
    assert abs(est["inter_est"] - 4000) / 4000 < 0.45


def test_kmv_small_sets_are_exact(spark):
    # both sets smaller than k: the sketch IS the set -> exact answers
    df = _sets(spark, {"a": (0, 100), "b": (50, 150)})
    est = kmv_pair_estimates(
        kmv_sketch(df, "key", ["grp"], k=256), "grp", k=256
    ).collect()[0]
    assert est["k_common"] == 50
    assert est["union_est"] == 150.0
    assert est["jaccard_est"] == round(50 / 150, 4)
    assert est["inter_est"] == 50.0


def test_kmv_sketch_merge_equals_union(spark):
    """sketch(union) == merge(sketches): union + keep k smallest."""
    a = _sets(spark, {"g": (0, 5000)})
    b = _sets(spark, {"g": (3000, 9000)})
    direct = kmv_sketch(a.unionByName(b), "key", ["grp"], k=128)
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(F.col("h48").asc())
    merged = (
        kmv_sketch(a, "key", ["grp"], k=128)
        .unionByName(kmv_sketch(b, "key", ["grp"], k=128))
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 128)
        .drop("__rn")
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, merged.collect()))


def test_kmv_partition_invariant(spark):
    df = _sets(spark, {"a": (0, 3000), "b": (1000, 4000)})
    r1 = kmv_pair_estimates(kmv_sketch(df, "key", ["grp"]), "grp").collect()
    r2 = kmv_pair_estimates(
        kmv_sketch(df.repartition(11), "key", ["grp"]), "grp"
    ).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_kmv_k_too_small_raises(spark):
    df = _sets(spark, {"a": (0, 10)})
    with pytest.raises(ValueError):
        kmv_sketch(df, "key", ["grp"], k=1)
    with pytest.raises(ValueError):
        kmv_pair_estimates(df, "grp", k=0)
