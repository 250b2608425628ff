"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship medallion query on sf0.001 (smoke: rows > 0).
queries()     — one entry per implemented operator (SURVEY.md §2 + north-star
                extensions), each (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query (None-oracled queries are
                omitted → driver records a rows-only check).

Implementations live in movie_genre_data_pipeline_spark.suite.* so they are
importable, testable library code; this file stays a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from movie_genre_data_pipeline_spark.suite import all_queries

    fn = all_queries()["flagship_revenue_by_flag_status"].fn
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from movie_genre_data_pipeline_spark.suite import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from movie_genre_data_pipeline_spark.suite import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
