"""Pipeline-invariant tests (SURVEY.md §5): the reference's observable behavior,
reconstructed as assertions since it ships no tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.plans.medallion import MedallionPipeline
from movie_genre_data_pipeline_spark.sources.batch import read_parquet


def _run(spark, pipeline_config, raw_movie_dir) -> MedallionPipeline:
    pipe = MedallionPipeline(spark, pipeline_config)
    pipe.raw_to_bronze(raw_movie_dir)
    pipe.bronze_to_silver()
    return pipe


def test_bronze_envelope(spark, pipeline_config, raw_movie_dir):
    pipe = MedallionPipeline(spark, pipeline_config)
    pipe.raw_to_bronze(raw_movie_dir)
    bronze = read_parquet(spark, pipeline_config.bronze_path)
    assert set(bronze.columns) == {
        "value", "datasource", "ingesttime", "status", "p_ingestdate"
    }
    assert bronze.count() == 7  # 4 + 3 movies, duplicates preserved at bronze
    assert bronze.filter(F.col("status") != "new").count() == 0
    assert bronze.select("datasource").distinct().collect()[0][0] == "movie.json"


def test_quarantine_split_and_status_machine(spark, pipeline_config, raw_movie_dir):
    pipe = _run(spark, pipeline_config, raw_movie_dir)
    bronze = read_parquet(spark, pipeline_config.bronze_path)
    # negative-RunTime movies (2, 4) quarantined — all their bronze dup rows too
    by_status = {
        r["status"]: r["n"]
        for r in bronze.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    assert by_status == {"loaded": 5, "quarantined": 2}
    silver = read_parquet(spark, pipeline_config.silver_path("movie"))
    assert sorted(r["Id"] for r in silver.select("Id").collect()) == [1, 3, 5]

    # repair loop: quarantined → abs(RunTime) → appended to silver → loaded
    n = pipe.silver_update()
    assert n == 2
    silver = read_parquet(spark, pipeline_config.silver_path("movie"))
    rows = {r["Id"]: r["RunTime"] for r in silver.collect()}
    assert rows[2] == 90 and rows[4] == 45  # abs() repaired
    bronze = read_parquet(spark, pipeline_config.bronze_path)
    assert bronze.filter(F.col("status") != "loaded").count() == 0


def test_budget_floor_and_types(spark, pipeline_config, raw_movie_dir):
    _run(spark, pipeline_config, raw_movie_dir)
    silver = read_parquet(spark, pipeline_config.silver_path("movie"))
    budgets = {r["Id"]: r["Budget"] for r in silver.collect()}
    assert budgets[1] == 100000.0  # floored from 50000
    assert budgets[3] == 500000.0  # untouched
    dtypes = dict(silver.dtypes)
    assert dtypes["Id"] == "int" and dtypes["RunTime"] == "int"
    assert dtypes["ReleaseDate"] == "date" and dtypes["p_CreatedDate"] == "date"
    assert dtypes["Genres_Id"] == "array<bigint>"
    assert "value" not in silver.columns  # struct excluded from written silver


def test_genres_and_language_dims(spark, pipeline_config, raw_movie_dir):
    _run(spark, pipeline_config, raw_movie_dir)
    genres = read_parquet(spark, pipeline_config.silver_path("genres"))
    rows = {(r["Id"], r["name"]) for r in genres.collect()}
    # empty-name genre (id=2) dropped; distinct applied
    assert rows == {(1, "Action"), (3, "Drama"), (4, "Comedy"), (5, "Horror")}
    language = read_parquet(spark, pipeline_config.silver_path("language"))
    lrows = {(r["Id"], r["OriginalLanguage"]) for r in language.collect()}
    # degenerate reference semantics: every language Id == 1 (SURVEY.md §8.3)
    assert lrows == {(1, "en"), (1, "fr"), (1, "de")}


def test_idempotent_rerun(spark, pipeline_config, raw_movie_dir):
    pipe = _run(spark, pipeline_config, raw_movie_dir)
    pipe.silver_update()
    first = {
        (r["Id"], r["RunTime"], r["Budget"])
        for r in read_parquet(spark, pipeline_config.silver_path("movie")).collect()
    }
    # re-run the whole pipeline on the same raw input → identical silver
    pipe2 = MedallionPipeline(spark, pipeline_config)
    pipe2.raw_to_bronze(raw_movie_dir)
    pipe2.bronze_to_silver()
    pipe2.silver_update()
    second = {
        (r["Id"], r["RunTime"], r["Budget"])
        for r in read_parquet(spark, pipeline_config.silver_path("movie")).collect()
    }
    assert first == second
