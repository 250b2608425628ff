"""Cleansing / repair / quarantine operators (SURVEY.md §2.3 P8-P10, §2.4 F3-F4,
§2.5 A1, §2.9 generate_clean_and_quarantine_dataframes, fix_genres).

All rule expressions are built-in Column functions → JVM-side, codegen'd, pushdown-
friendly. The quarantine split deliberately dedups ONCE and splits with two filters
over the deduped frame — the reference calls distinct() twice
(operations/operations.py:105-106; SURVEY.md §8.7), computing the same shuffle
twice. Catalyst does not share subplans across separate action trees, so callers
that consume both halves should cache the deduped frame (the pipeline does).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """Explicit re-typing at silver (reference: operations/operations.py:65,68,77-78
    — cast("INTEGER") on Id/RunTime, cast("DATE") on ReleaseDate/CreatedDate)."""
    cols = [
        (F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c))
        for c in df.columns
    ]
    return df.select(*cols)


def conditional_floor(col: str | Column, floor: float) -> Column:
    """Value floor via when/otherwise (reference: operations/operations.py:84 —
    Budget < 100000 → 100000)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c < floor, F.lit(floor)).otherwise(c)


def abs_repair(df: DataFrame, col: str) -> DataFrame:
    """Negative-value repair (reference: operations/operations.py:141 —
    RunTime = abs(RunTime) on quarantined rows)."""
    return df.withColumn(col, F.abs(F.col(col)))


def quarantine_split(df: DataFrame, clean_predicate: Column) -> tuple[DataFrame, DataFrame]:
    """Dedup once, then split into (clean, quarantined) on one predicate
    (reference: operations/operations.py:103-107, minus the double-distinct bug).

    Returns two DataFrames sharing one distinct() subplan; callers running both
    should `.cache()` the parent or write it once (the medallion plan does the
    latter — bronze IS the materialization).
    """
    deduped = df.distinct()
    return deduped.filter(clean_predicate), deduped.filter(~clean_predicate)


def drop_empty(df: DataFrame, col: str) -> DataFrame:
    """Empty-string row drop (reference: operations/operations.py:54 name != "")."""
    return df.filter(F.col(col) != "")


def fix_dimension(
    df: DataFrame,
    id_col: str,
    name_col: str,
    order: bool = True,
) -> DataFrame:
    """Dimension cleanup: distinct → drop empty names → optional global sort
    (reference: operations/operations.py:53-54 fix_genres; the streaming variant
    drops the sort — SURVEY.md §8.9 — because global sort is unsupported on
    append-mode streams)."""
    out = drop_empty(df.select(id_col, name_col).distinct(), name_col)
    return out.orderBy(id_col) if order else out
