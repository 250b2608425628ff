"""Movie-domain silver projections (SURVEY.md §2.9 transform_bronze/fix_genres).

Re-expression of the reference's bronze→silver branch transforms
(Batch_notebook/operations/operations.py:59-99) as pure DataFrame→DataFrame
functions. Behavior pinned to the reference byte-for-byte where observable:

- Budget floor is 100,000 (the CODE value; notebook prose claims 1M —
  SURVEY.md §8.4) and is applied AFTER the select, so the floored literal takes
  the double type of the otherwise branch.
- `Genres_Id` is element-wise `id` extraction over the `genres` array
  (operations/operations.py:82 relies on case-insensitive resolution of
  "Genres.id"; we reference the field by its real name).
- `Language_Id = lit(1)` reproduces the reference's degenerate language dimension
  (every language row gets Id=1 — SURVEY.md §8.3). `language_projection` offers
  `degenerate=False` to mint stable ids instead (hash of the language string) —
  off by default to preserve parity.
- The struct `value` column is carried through for merge-back and excluded at
  write time (SURVEY.md §8.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.operators.cleanse import conditional_floor, fix_dimension
from movie_genre_data_pipeline_spark.operators.nested import extract_array_field

# Written silver schema (value excluded) — Batch_notebook/bronzeToSilver.py:116-141.
MOVIE_SILVER_COLUMNS = [
    "Id", "Budget", "Revenue", "RunTime", "Price", "Title", "Overview", "Tagline",
    "ImdbUrl", "TmdbUrl", "PosterUrl", "BackdropUrl", "ReleaseDate", "p_CreatedDate",
    "UpdatedDate", "UpdatedBy", "CreatedBy", "Genres_Id", "Language_Id",
]


def movie_projection(bronze_augmented: DataFrame, budget_floor: float = 100_000.0) -> DataFrame:
    """`transform_bronze(..., "movie")` (operations/operations.py:63-84).

    Input: bronze rows already expanded via `select("value", "value.*")`.
    """
    projected = bronze_augmented.select(
        F.col("value"),
        F.col("Id").cast("INTEGER").alias("Id"),
        F.col("Budget"),
        F.col("Revenue"),
        F.col("RunTime").cast("INTEGER").alias("RunTime"),
        F.col("Price"),
        F.col("Title"),
        F.col("Overview"),
        F.col("Tagline"),
        F.col("ImdbUrl"),
        F.col("TmdbUrl"),
        F.col("PosterUrl"),
        F.col("BackdropUrl"),
        F.col("ReleaseDate").cast("DATE").alias("ReleaseDate"),
        F.col("CreatedDate").cast("DATE").alias("p_CreatedDate"),
        F.col("UpdatedDate"),
        F.col("UpdatedBy"),
        F.col("CreatedBy"),
        extract_array_field("genres", "id").alias("Genres_Id"),
        F.lit(1).alias("Language_Id"),
    )
    return projected.withColumn("Budget", conditional_floor("Budget", budget_floor))


def genres_projection(bronze_augmented: DataFrame, order: bool = True) -> DataFrame:
    """`transform_bronze(..., "genres")` (operations/operations.py:86-89 + fix_genres
    :53-54): explode genres → flatten → distinct → drop empty names → sort by Id.
    Streaming callers pass order=False (global sort unsupported on append streams —
    SURVEY.md §8.9)."""
    exploded = bronze_augmented.select(F.explode(F.col("genres")))
    flat = exploded.select(
        F.col("col.id").alias("Id"), F.col("col.name").alias("name")
    )
    return fix_dimension(flat, "Id", "name", order=order)


def language_projection(bronze_augmented: DataFrame, degenerate: bool = True) -> DataFrame:
    """`transform_bronze(..., "language")` (operations/operations.py:91-97).

    Parity mode (default): every row gets Id=1 — the reference bug (SURVEY.md §8.3).
    degenerate=False mints a stable surrogate id per language (positive 32-bit hash)
    so `Language_Id` can actually join.
    """
    langs = bronze_augmented.select(F.col("OriginalLanguage")).distinct()
    if degenerate:
        id_col = F.lit(1)
    else:
        id_col = F.pmod(F.xxhash64("OriginalLanguage"), F.lit(2**31 - 1)).cast("INTEGER")
    return langs.select(id_col.alias("Id"), F.col("OriginalLanguage"))
