from movie_genre_data_pipeline_spark.functions import (
    dedup,
    kmeans,
    multimodal,
    similarity,
    text,
)

__all__ = ["text", "dedup", "similarity", "multimodal", "kmeans"]
