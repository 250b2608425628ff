"""Streaming sources (SURVEY.md §2.1 S3/S4).

The reference uses Databricks Autoloader (`cloudFiles`) for incremental file
discovery (reference: Autoloader_notebook/Raw_to_Bronze.py:33-42). The open-source
equivalent is the Structured Streaming file source: checkpointed file discovery,
explicit schema, `availableNow` trigger for the reference's run-one-increment
`Trigger.Once` pattern (deprecated in Spark 4.x; availableNow is the replacement,
and it additionally rate-limits via maxFilesPerTrigger instead of one giant batch —
exactly what you want when a backfill drops 100 TB of files at once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "json",
    multiline: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental file scan with frozen schema.

    Reference parity: Autoloader_notebook/Raw_to_Bronze.py:33-42
    (`readStream.format("cloudFiles").option("cloudFiles.format","json")
    .option("multiline","True").schema(json_schema).load(...)`).
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "json" and multiline:
        reader = reader.option("multiline", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
