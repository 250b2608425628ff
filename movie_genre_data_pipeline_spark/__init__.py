"""movie_genre_data_pipeline_spark — a PySpark-native medallion ELT engine.

A brand-new, idiomatic open-source-Spark-4.x re-expression of the capabilities of
MengLungLee/Movie_Genre_Data_pipeline (a Databricks Bronze/Silver medallion pipeline
for nested movie-genre JSON; see SURVEY.md), extended with the operators a
large-scale (100 TB) training-data pipeline needs: dedup (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding cosine), similarity search, multimodal binary
columns, and text analysis.

Design rules (SURVEY.md §7):
- DataFrame/SQL first; Catalyst does pushdown/pruning/join planning.
- No Delta in this environment: tables are partitioned Parquet; MERGE becomes a
  join-based upsert (operators/upsert.py).
- No Databricks surfaces (dbutils/cloudFiles/display): pathlib + OSS Structured
  Streaming file source with availableNow triggers.
- Non-determinism (current_timestamp) is behind an injectable clock (config.Clock).
"""

from movie_genre_data_pipeline_spark.config import PipelineConfig, Clock
from movie_genre_data_pipeline_spark.session import build_session

__all__ = ["PipelineConfig", "Clock", "build_session"]
__version__ = "0.1.0"
