"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting handles skewed JOINS automatically (session.py), but a
skewed AGGREGATION key (a handful of giant groups — e.g. 3 return-flag values
over a 100 TB lineitem) still funnels each hot group through one reducer in a
single-stage plan. Salting splits every group across `n_salts` reducers in
stage 1 (partial merge on (key, salt)), then merges the partials in stage 2 —
the second shuffle carries only n_groups × n_salts rows, which is ~free.

Only decomposable aggregates (sum/count/min/max, and avg = sum/count) can be
salted this way; the helper exposes exactly those. Results are salt-invariant by
algebra, so the salt can be anything uniform — we use a seeded `rand` (cheap, no
extra column dependencies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-resistant aggregate of `value_col` per `keys`:
    (n_rows, total, minimum, maximum, mean) — identical to the single-stage
    groupBy by algebra, but hot groups fan out over `n_salts` stage-1 reducers.
    """
    salted = df.withColumn(
        "__salt", F.floor(F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.count(value_col).alias("__nv"),  # non-null count: avg() ignores NULLs
        F.sum(value_col).alias("__sum"),
        F.min(value_col).alias("__min"),
        F.max(value_col).alias("__max"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        F.sum("__sum").alias("total"),
        F.min("__min").alias("minimum"),
        F.max("__max").alias("maximum"),
        # sum/non-null-count == single-stage avg() even with NULLs in value_col
        (F.sum("__sum") / F.sum("__nv")).alias("mean"),
    )
