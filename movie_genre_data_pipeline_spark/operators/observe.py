"""Observed writes: audit metrics as side-outputs of the write pass.

The reference gathers its pipeline counters with SEPARATE count queries after
each write — `SELECT COUNT(*) ...` pulled via collect()
(reference: Autoloader_notebook/Bronze_to_Silver.py:313-316,
Silver_update.py:162-163; SURVEY.md §2.5 A2). That is one extra full scan per
counter; at 100 TB the audit pass costs as much as the write.

`write_with_metrics` attaches a `pyspark.sql.Observation` to the frame being
written: the metrics (counts, conditional counts, sums — any aggregate
expression) are accumulated BY the write job itself, executor-side, and
collected from the observation after the action finishes. Zero additional
scans, exact values (unlike accumulators, observed metrics are
task-retry-safe: Spark de-duplicates per-task updates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation


def write_with_metrics(
    df: DataFrame,
    path: str,
    metrics: Sequence[Column],
    partition_column: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> dict[str, object]:
    """Write `df` to `path` and return the observed metric values computed
    during that same job. Each metric must be an aggregate Column with an
    explicit alias (the alias becomes the result key)."""
    obs = Observation()
    observed = df.observe(obs, *metrics)
    writer = observed.write.format(fmt).mode(mode)
    if partition_column:
        writer = writer.partitionBy(partition_column)
    writer.save(path)
    return dict(obs.get)
