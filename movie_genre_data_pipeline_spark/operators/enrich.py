"""Audit-column enrichment (SURVEY.md §2.9 `transform_raw`).

Reference parity: Batch_notebook/operations/operations.py:25-32 — every bronze row
carries (datasource, ingesttime, value-struct, status="new", p_ingestdate). The
`p_`-prefixed date column exists solely to drive partition pruning on the bronze
table; we keep the convention. `status` seeds the record-status state machine
`new → loaded | quarantined → loaded` (SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.config import Clock

STATUS_NEW = "new"
STATUS_LOADED = "loaded"
STATUS_QUARANTINED = "quarantined"


def with_audit_columns(
    df: DataFrame,
    datasource: str,
    clock: Clock | None = None,
    value_column: Column | str = "value",
) -> DataFrame:
    """Wrap each record in the bronze envelope.

    `value_column` is the payload (the reference stores the whole exploded movie
    struct as `value`, operations/operations.py:27). The clock is injectable so
    tests are deterministic (the reference uses raw current_timestamp()).
    """
    clock = clock or Clock()
    now = clock.now()
    value = F.col(value_column) if isinstance(value_column, str) else value_column
    return df.select(
        value.alias("value"),
        F.lit(datasource).alias("datasource"),
        now.alias("ingesttime"),
        F.lit(STATUS_NEW).alias("status"),
        now.cast("date").alias("p_ingestdate"),
    )
