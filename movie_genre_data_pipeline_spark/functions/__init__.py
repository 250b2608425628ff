from movie_genre_data_pipeline_spark.functions import text, dedup, similarity, multimodal

__all__ = ["text", "dedup", "similarity", "multimodal"]
