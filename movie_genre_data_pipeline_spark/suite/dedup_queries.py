from movie_genre_data_pipeline_spark.suite import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
