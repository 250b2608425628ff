"""Gold-layer star mart — the medallion stage the reference DESCRIBES but never
builds (its README sketches Bronze/Silver/Gold; the pipeline stops at three
Silver tables — /root/reference/README.md:10-15, SURVEY.md §0).

This module completes the story: `movie_silver` (fact, one row per movie with a
`Genres_Id` array) × `genres_silver` (dimension) → one aggregated mart row per
genre. The plan is the canonical star rollup:

- explode the genre-id array (one fact row per (movie, genre) membership),
- broadcast the genre dimension (genre dims are tiny — tens of rows — so the
  join is shuffle-free on the fact side at any fact scale),
- one hash aggregate on (genre_id, genre_name) with map-side partial
  aggregation.

At 100 TB the only shuffle is the final aggregate on ~|genres| keys; the
explode and broadcast-hash-join pipeline inside one stage over the fact scan.

Semantics notes (documented, pinned by tests):
- Movies with an empty/NULL `Genres_Id` array don't appear (the mart covers
  genre memberships; `explode` drops them by design).
- Genre ids absent from the dimension are dropped by the inner join (the dim
  is the mart's foreign-key contract).
- `avg_runtime` averages non-NULL runtimes (SQL AVG semantics); the int sum
  is exact, so the quotient is bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_genre_revenue_mart(
    movie_silver: DataFrame,
    genres_silver: DataFrame,
    genre_array_col: str = "Genres_Id",
) -> DataFrame:
    """(genre_id, genre_name, n_movies, total_revenue, total_budget,
    avg_runtime) — one row per genre, ordered by genre_id."""
    exploded = movie_silver.select(
        F.col("Revenue"),
        F.col("Budget"),
        F.col("RunTime"),
        F.explode(genre_array_col).alias("genre_id"),
    )
    dim = F.broadcast(
        genres_silver.select(
            F.col("Id").alias("genre_id"), F.col("name").alias("genre_name")
        )
    )
    return (
        exploded.join(dim, "genre_id")
        .groupBy("genre_id", "genre_name")
        .agg(
            F.count(F.lit(1)).alias("n_movies"),
            F.round(F.sum("Revenue"), 2).alias("total_revenue"),
            F.round(F.sum("Budget"), 2).alias("total_budget"),
            F.round(F.avg("RunTime"), 4).alias("avg_runtime"),
        )
        .orderBy("genre_id")
    )
