"""time_bucket_gapfill contract: the output is a DENSE axis (every bucket from
min to max present for every group), observed buckets keep their aggregates,
gaps carry the fill identities, and the spine join never becomes a shuffle of
the fact side."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.sampling import corpus_shuffle
from movie_genre_data_pipeline_spark.operators.timeseries import (
    time_bucket,
    time_bucket_gapfill,
)


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (base + dt.timedelta(hours=h), g, float(v))
        # hour 2 missing entirely; hour 1 missing for group "b"
        for h, g, v in [(0, "a", 1.0), (0, "b", 2.0), (1, "a", 3.0), (3, "a", 4.0), (3, "b", 5.0)]
    ]
    return spark.createDataFrame(rows, "ts timestamp, g string, value double")


def test_dense_axis_with_fill_identities(spark):
    out = time_bucket_gapfill(
        _events(spark),
        "ts",
        3600,
        aggs={"n": F.count(F.lit(1)).cast("bigint"), "s": F.sum("value")},
        fill={"n": F.lit(0).cast("bigint"), "s": F.lit(0.0)},
        group_cols=("g",),
    ).collect()
    # 4 hourly buckets × 2 groups = 8 dense rows
    assert len(out) == 8
    by_key = {(r.bucket.hour, r.g): (r.n, r.s) for r in out}
    assert by_key[(0, "a")] == (1, 1.0)
    assert by_key[(2, "a")] == (0, 0.0)  # fully missing bucket
    assert by_key[(2, "b")] == (0, 0.0)
    assert by_key[(1, "b")] == (0, 0.0)  # group-local gap
    assert by_key[(3, "b")] == (1, 5.0)


def test_no_groups_variant(spark):
    out = time_bucket_gapfill(
        _events(spark),
        "ts",
        3600,
        aggs={"n": F.count(F.lit(1)).cast("bigint")},
        fill={"n": F.lit(0).cast("bigint")},
    ).collect()
    assert len(out) == 4
    assert {r.bucket.hour: r.n for r in out} == {0: 2, 1: 1, 2: 0, 3: 2}


def test_fill_must_cover_aggs(spark):
    with pytest.raises(ValueError, match="fill"):
        time_bucket_gapfill(
            _events(spark),
            "ts",
            3600,
            aggs={"n": F.count(F.lit(1))},
            fill={},
        )


def test_time_bucket_floor_semantics(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 5, 59, 59),)], "ts timestamp"
    )
    [r] = df.select(time_bucket("ts", 3600).alias("b")).collect()
    assert r.b == dt.datetime(2024, 1, 1, 5, 0, 0)


def test_corpus_shuffle_is_partition_invariant(spark):
    """(shard, pos) must be a pure function of the key — identical after any
    repartitioning, which seed-based orderBy(rand()) cannot promise."""
    df = spark.range(200).select(F.col("id").cast("string").alias("k"))
    a = corpus_shuffle(df, "k", 8)
    b = corpus_shuffle(df.repartition(13), "k", 8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # every shard's positions are 1..n contiguous
    import collections

    pos = collections.defaultdict(list)
    for r in a.collect():
        pos[r.shard].append(r.pos)
    for shard, ps in pos.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


# -- rolling_zscore ---------------------------------------------------------------
def test_rolling_zscore_matches_hand_computation(spark):
    from movie_genre_data_pipeline_spark.operators.timeseries import rolling_zscore

    # series: 5 stable values then a spike; lookback 5, min_periods 3
    vals = [10, 10, 10, 10, 12, 40]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "t int, g string, x int"
    )
    out = {
        r["t"]: r
        for r in rolling_zscore(
            df, "t", "x", ("g",), lookback=5, min_periods=3
        ).collect()
    }
    # first rows: baseline too small -> NULL
    assert out[0]["zscore"] is None and out[0]["baseline_n"] == 0
    assert out[2]["zscore"] is None and out[2]["baseline_n"] == 2
    # t=3 baseline [10,10,10]: zero variance -> NULL
    assert out[3]["zscore"] is None and out[3]["baseline_n"] == 3
    # t=5 baseline [10,10,10,10,12]: mean 10.4, var 0.8; z=(40-10.4)/sqrt(.8)
    import math

    assert out[5]["baseline_n"] == 5
    assert out[5]["zscore"] == pytest.approx((40 - 10.4) / math.sqrt(0.8))


def test_rolling_zscore_excludes_current_row(spark):
    from movie_genre_data_pipeline_spark.operators.timeseries import rolling_zscore

    # the spike itself must not contaminate its own baseline: with [5]*6 + [50],
    # the spike's baseline stats are those of the stable prefix only
    df = spark.createDataFrame(
        [(i, 5) for i in range(6)] + [(6, 50)], "t int, x int"
    )
    rows = {r["t"]: r for r in rolling_zscore(df, "t", "x", (), 6, 3).collect()}
    # baseline of t=6 is six 5s: zero variance -> NULL despite the huge jump?
    # no — zero variance yields NULL by contract (no denominator); assert that
    assert rows[6]["zscore"] is None and rows[6]["baseline_n"] == 6
    # perturb one baseline point -> finite, large z
    df2 = spark.createDataFrame(
        [(i, 5) for i in range(5)] + [(5, 7), (6, 50)], "t int, x int"
    )
    rows2 = {r["t"]: r for r in rolling_zscore(df2, "t", "x", (), 6, 3).collect()}
    assert rows2[6]["zscore"] is not None and rows2[6]["zscore"] > 10


def test_seasonal_naive_perfect_on_periodic_series(spark):
    """A series that repeats exactly every SEASON buckets must backtest with
    mae = bias = worst = 0 — the defining law of the seasonal-naive model."""
    from datetime import datetime, timedelta

    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        SEASON_BUCKETS,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t0 = datetime(2024, 1, 1)
    rows = [
        (t0 + timedelta(hours=h), "a", (h % SEASON_BUCKETS) + 1)
        for h in range(SEASON_BUCKETS * 3)
    ]
    dense = spark.createDataFrame(rows, ["bucket", "event_type", "n"])
    w = Window.partitionBy("event_type").orderBy("bucket")
    scored = dense.withColumn(
        "nhat", F.lag("n", SEASON_BUCKETS).over(w)
    ).filter(F.col("nhat").isNotNull())
    err = F.col("n") - F.col("nhat")
    out = scored.groupBy("event_type").agg(
        F.count("*").alias("n_eval"),
        F.avg(F.abs(err)).alias("mae"),
        F.max(F.abs(err)).alias("worst"),
    ).collect()[0]
    assert out.n_eval == SEASON_BUCKETS * 2
    assert out.mae == 0.0 and out.worst == 0


def test_ab_report_assignment_conserves_users_and_is_deterministic(spark):
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        q_ab_experiment_report,
    )

    sf = "/root/testdata/sf0.001"
    a = q_ab_experiment_report(spark, sf).collect()[0]
    b = q_ab_experiment_report(spark, sf).collect()[0]
    assert a == b  # md5 assignment: same arms every run, any cluster
    n_users = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert a.n_c + a.n_t == n_users
    assert a.n_c > 1 and a.n_t > 1  # both arms populated (t-test defined)
