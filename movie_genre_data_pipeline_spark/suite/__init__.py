"""Driver-contract query suite.

Each module exposes ``QUERIES: dict[str, QuerySpec]`` mapping a query name to a
(spark_fn, oracle_sql) pair. ``spark_fn(spark, sf_dir) -> DataFrame`` is the
engine-side implementation (idiomatic DataFrame API, exercising the operators in
movie_genre_data_pipeline_spark.operators / functions); ``oracle_sql`` is the ANSI
SQL DuckDB equivalent, or None for ops that aren't SQL-expressible (driver then
records a rows-only check).

Column-name discipline: every computed column is aliased IDENTICALLY in both sides
(the driver sorts columns by name and hashes values). Numeric discipline: aggregates
are explicitly cast/rounded on both sides (DuckDB sums integers into HUGEINT and we
pin DOUBLE/BIGINT instead; floating sums are rounded to a fixed scale so
accumulation-order noise can't flip the hash).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession


class QuerySpec(NamedTuple):
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.sources.batch import read_parquet

    # The driver runs these on ITS OWN session; timestamp rendering
    # (date_format/window starts) must match the tz-naive DuckDB oracle
    # regardless of that session's locale, so pin UTC at query time
    # (runtime-settable conf).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_parquet(spark, f"{sf_dir}/{table}.parquet")


def all_queries() -> dict[str, QuerySpec]:
    from movie_genre_data_pipeline_spark.suite import (
        dedup_queries,
        multimodal_queries,
        pipeline_queries,
        relational,
        relational_extra,
        similarity_queries,
        streaming_queries,
        text_queries,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (
        pipeline_queries,
        relational,
        relational_extra,
        text_queries,
        dedup_queries,
        similarity_queries,
        streaming_queries,
        multimodal_queries,
    ):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
