from movie_genre_data_pipeline_spark.plans.movie_transforms import (
    movie_projection,
    genres_projection,
    language_projection,
    MOVIE_SILVER_COLUMNS,
)
from movie_genre_data_pipeline_spark.plans.medallion import MedallionPipeline

__all__ = [
    "movie_projection",
    "genres_projection",
    "language_projection",
    "MOVIE_SILVER_COLUMNS",
    "MedallionPipeline",
]
