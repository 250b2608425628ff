from movie_genre_data_pipeline_spark.streaming.incremental import (
    IncrementalMedallionPipeline,
)

__all__ = ["IncrementalMedallionPipeline"]
