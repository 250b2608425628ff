from movie_genre_data_pipeline_spark.sources.batch import (
    read_multiline_json,
    read_parquet,
    read_table,
    freeze_schema,
)
from movie_genre_data_pipeline_spark.sources.streaming import read_file_stream

__all__ = [
    "read_multiline_json",
    "read_parquet",
    "read_table",
    "freeze_schema",
    "read_file_stream",
]
