"""Salted-join invariants: result equality with the plain join (salt-invariance
by algebra), hot-key-only replication, join-type guard."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from movie_genre_data_pipeline_spark.operators.skew import salted_join

SF_DIR = "/root/testdata/sf0.001"


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_inner(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    plain = li.join(sup, "l_suppkey")
    salted = salted_join(li, sup, on="l_suppkey", n_salts=8)
    assert _norm(salted.select(*plain.columns)) == _norm(plain)


def test_salted_join_left_keeps_unmatched_big_rows(spark):
    big = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=1, v="b"), Row(k=99, v="orphan")]
    )
    small = spark.createDataFrame([Row(k=1, d="dim1")])
    out = salted_join(big, small, on="k", n_salts=4, how="left")
    got = _norm(out.select("k", "v", "d"))
    assert got == [(1, "a", "dim1"), (1, "b", "dim1"), (99, "orphan", None)]


def test_salted_join_hot_keys_only_replicates_hot_dim_rows(spark):
    big = spark.createDataFrame([Row(k=i % 3, v=i) for i in range(30)])
    small = spark.createDataFrame([Row(k=0, d="hot"), Row(k=1, d="c1"), Row(k=2, d="c2")])
    out = salted_join(big, small, on="k", n_salts=5, hot_keys=[0])
    plain = big.join(small, "k")
    assert _norm(out.select("k", "v", "d")) == _norm(plain.select("k", "v", "d"))


def test_salted_join_rejects_right_and_full(spark):
    df = spark.createDataFrame([Row(k=1)])
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(df, df, on="k", how=how)
    with pytest.raises(ValueError):
        salted_join(df, df, on="k", n_salts=0)


def test_detect_hot_keys_threshold_and_bound(spark):
    from movie_genre_data_pipeline_spark.operators.skew import detect_hot_keys

    big = spark.createDataFrame(
        [Row(k=0)] * 50 + [Row(k=1)] * 10 + [Row(k=2)] * 3
    )
    assert sorted(detect_hot_keys(big, "k", 10)) == [0, 1]
    assert detect_hot_keys(big, "k", 51) == []
    with pytest.raises(ValueError):
        detect_hot_keys(big, "k", 0)
    # end-to-end: detected whales feed salted_join and the result still
    # matches the plain join
    small = spark.createDataFrame([Row(k=0, d="x"), Row(k=1, d="y"), Row(k=2, d="z")])
    hot = detect_hot_keys(big, "k", 10)
    out = salted_join(big, small, on="k", n_salts=4, hot_keys=hot)
    assert _norm(out.select("k", "d")) == _norm(big.join(small, "k").select("k", "d"))
