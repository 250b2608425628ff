"""Nested struct/array operators (SURVEY.md §2.3 P2-P5).

These are all narrow (no-shuffle) transformations: at 100 TB they stream through
whole-stage codegen without materializing anything. `explode` multiplies row count
but not bytes (each output row references the parent's columns), so the only scale
concern is downstream shuffle sizing — handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_array(df: DataFrame, array_col: str, alias: str | None = None) -> DataFrame:
    """Array → rows (reference: operations/operations.py:21 explode(movie);
    :87-89 explode(genres)). The reference's only table-generating function."""
    exploded = F.explode(F.col(array_col)).alias(alias or array_col)
    others = [c for c in df.columns if c != array_col]
    return df.select(*others, exploded)


def expand_struct(df: DataFrame, struct_col: str, keep_struct: bool = True) -> DataFrame:
    """Struct star-expansion (reference: operations/operations.py:60
    `select("value", "value.*")`) — flattens the payload while optionally carrying
    the original struct through for merge-back (SURVEY.md §8.8)."""
    if keep_struct:
        return df.select(struct_col, f"{struct_col}.*")
    return df.select(f"{struct_col}.*")


def extract_array_field(array_col: str | Column, field: str) -> Column:
    """Field extraction over array<struct> → array<field type>
    (reference: operations/operations.py:82 `col("Genres.id")`).

    Expressed as `transform(arr, x -> x.field)` — same Catalyst plan as dot-path
    resolution but explicit about element-wise semantics.
    """
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    return F.transform(col, lambda x: x.getField(field))


def flatten_exploded_struct(df: DataFrame, struct_col: str = "col") -> DataFrame:
    """Flatten the struct produced by explode (reference: operations/operations.py:54
    `select(col("col.*"))`)."""
    return df.select(F.col(f"{struct_col}.*"))
