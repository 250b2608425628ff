"""Batch sources (SURVEY.md §2.1 S1/S2/S5).

Scale notes:
- JSON schema inference is an extra full read of the input; at 100 TB you pass an
  explicit schema (or freeze one from a sample) — `freeze_schema` exists for that.
- Parquet scans get predicate pushdown + column pruning from Catalyst for free as
  long as callers express filters/projections on the DataFrame, not in Python.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_multiline_json(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Multiline-JSON directory scan (reference: Batch_notebook/operations/operations.py:20).

    With `schema=None` Spark infers (eager read — fine for small raw zones, not for
    100 TB; freeze a schema first).
    """
    reader = spark.read.option("multiline", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Partitioned-Parquet scan — our stand-in for the reference's Delta scans."""
    return spark.read.parquet(path)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog table scan (reference: operations/operations.py:49 `spark.read.table`)."""
    return spark.read.table(name)


def freeze_schema(df: DataFrame) -> StructType:
    """Infer-once/freeze schema round-trip for streaming sources
    (reference: Autoloader_notebook/Raw_to_Bronze.py:21-23
    `StructType.fromJson(json.loads(tmp.schema.json()))`): streaming file sources
    require a declared schema, so the reference infers from a batch read then
    round-trips through JSON. Identical mechanism here.
    """
    return StructType.fromJson(json.loads(df.schema.json()))
