"""Interval (range) join — point-in-interval matching without a non-equi join.

Catalyst plans a raw `p.ts BETWEEN i.start AND i.end` join as
BroadcastNestedLoopJoin (O(n·m) pairs) unless one side is tiny. The scale shape
is BUCKETING: quantize time into fixed buckets, explode each interval into the
buckets it overlaps, bucket each point once, then equi-join on
(keys…, bucket) + residual filter. Work becomes O(points + intervals·spread +
matches) and the join is an ordinary shuffle/broadcast hash join AQE can manage.
Pick `granularity_ms` near the typical interval length: each interval then
explodes into ~2 buckets, and a point meets an interval in exactly one bucket
(its own), so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.operators.timeseries import epoch_millis


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    granularity_ms: int,
) -> DataFrame:
    """Inner-join each point row to every interval row (sharing the `on` keys)
    with ``start_ts <= point_ts <= end_ts`` (inclusive, BETWEEN semantics).
    Returns all columns from both sides (non-key column names must not collide).
    """
    p = points.withColumn(
        "__bucket", F.floor(epoch_millis(point_ts) / granularity_ms)
    )
    iv = (
        intervals.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(epoch_millis(start_ts) / granularity_ms),
                    F.floor(epoch_millis(end_ts) / granularity_ms),
                )
            ),
        )
    )
    joined = p.join(iv, on + ["__bucket"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("__bucket")
