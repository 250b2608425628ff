from movie_genre_data_pipeline_spark.operators.enrich import with_audit_columns
from movie_genre_data_pipeline_spark.operators.nested import (
    explode_array,
    expand_struct,
    extract_array_field,
    flatten_exploded_struct,
)
from movie_genre_data_pipeline_spark.operators.cleanse import (
    cast_columns,
    conditional_floor,
    abs_repair,
    quarantine_split,
    drop_empty,
    fix_dimension,
)
from movie_genre_data_pipeline_spark.operators.upsert import (
    upsert_update,
    upsert_insert_missing,
)
from movie_genre_data_pipeline_spark.operators.writers import (
    batch_writer,
    write_partitioned,
    write_bucketed_table,
    write_clustered,
)
from movie_genre_data_pipeline_spark.operators.asof import asof_join
from movie_genre_data_pipeline_spark.operators.interval import interval_join
from movie_genre_data_pipeline_spark.operators.scd import scd2_apply
from movie_genre_data_pipeline_spark.operators.skew import (
    detect_hot_keys,
    salted_agg,
    salted_join,
)
from movie_genre_data_pipeline_spark.operators.compact import compact_parquet_dir
from movie_genre_data_pipeline_spark.operators.observe import write_with_metrics

__all__ = [
    "asof_join",
    "compact_parquet_dir",
    "detect_hot_keys",
    "interval_join",
    "salted_agg",
    "salted_join",
    "scd2_apply",
    "write_bucketed_table",
    "with_audit_columns",
    "explode_array",
    "expand_struct",
    "extract_array_field",
    "flatten_exploded_struct",
    "cast_columns",
    "conditional_floor",
    "abs_repair",
    "quarantine_split",
    "drop_empty",
    "fix_dimension",
    "upsert_update",
    "upsert_insert_missing",
    "batch_writer",
    "write_partitioned",
    "write_clustered",
    "write_with_metrics",
]
