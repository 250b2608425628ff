"""Column profiling: the data-quality summary pass a pipeline runs before
trusting a new table (nulls, cardinality, numeric ranges per column).

Reference parity: the reference eyeballs quality via display()/printSchema()
(SURVEY.md §5); this is that practice made a first-class, testable operator.

Scale shape: ONE aggregate job over the table computes every per-column metric
as a partial/final agg (single 1-row result), then the 1-row frame is unpivoted
driver-free into (column, metrics) rows. Cost is one scan regardless of column
count; countDistinct columns rewrite to expand, which AQE plans as one shuffle
per distinct-column — acceptable for profiling runs, and callers can pass
``approx=True`` to use HLL sketches (approx_count_distinct) instead, which
keeps it to a single shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_columns(df: DataFrame, columns: list[str], approx: bool = False) -> DataFrame:
    """Profile ``columns`` of ``df`` → one row per column:
    (col_name, n_nulls, n_distinct, min_num, max_num) — min/max are NULL for
    non-numeric columns. Distinct counts are exact by default, HLL when
    ``approx`` (the 100 TB setting)."""
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = []
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"))
        aggs.append(distinct(F.col(c)).alias(f"{c}__distinct"))
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"{c}__max"))
    one_row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (
                    F.col(f"{c}__min")
                    if c in numeric
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"{c}__max")
                    if c in numeric
                    else F.lit(None).cast("double")
                ).alias("max_num"),
            )
            for c in columns
        ]
    )
    return one_row.select(F.explode(per_col).alias("p")).select("p.*")
