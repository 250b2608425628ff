"""CLI entry point — the runnable equivalent of the reference's notebook driver
(Batch_notebook/main.py:63-65 runs raw_to_bronze → bronze_to_silver →
silver_update; the Autoloader notebooks run the same stages incrementally).

    python -m movie_genre_data_pipeline_spark --raw /path/to/json-dir \
        --lake /path/to/lake [--variant batch|incremental] [--fixed-clock TS]

Writes bronze + three silver tables under --lake and prints per-table row counts.
"""

from __future__ import annotations

import argparse


def main() -> int:
    parser = argparse.ArgumentParser(prog="movie_genre_data_pipeline_spark")
    parser.add_argument("--raw", required=True, help="directory of multiline JSON files")
    parser.add_argument("--lake", required=True, help="medallion lake root directory")
    parser.add_argument(
        "--variant",
        choices=["batch", "incremental"],
        default="batch",
        help="batch = overwrite pipeline; incremental = checkpointed streaming",
    )
    parser.add_argument(
        "--fixed-clock",
        default=None,
        metavar="TS",
        help='deterministic ingesttime, e.g. "2024-01-01 00:00:00" (default: now)',
    )
    parser.add_argument("--master", default=None, help="Spark master (default local[*])")
    args = parser.parse_args()

    from movie_genre_data_pipeline_spark.config import Clock, PipelineConfig
    from movie_genre_data_pipeline_spark.session import build_session
    from movie_genre_data_pipeline_spark.sources.batch import read_parquet

    spark = build_session(app_name="mgdp-cli", master=args.master)
    config = PipelineConfig(root=args.lake, clock=Clock(fixed_utc=args.fixed_clock))

    if args.variant == "batch":
        from movie_genre_data_pipeline_spark.plans.medallion import MedallionPipeline

        MedallionPipeline(spark, config).run(args.raw)
    else:
        from movie_genre_data_pipeline_spark.streaming.incremental import (
            IncrementalMedallionPipeline,
        )

        IncrementalMedallionPipeline(spark, config).run(args.raw)

    for label, path in [
        ("bronze", config.bronze_path),
        ("movie_silver", config.silver_path("movie")),
        ("genres_silver", config.silver_path("genres")),
        ("language_silver", config.silver_path("language")),
    ]:
        print(f"{label}: {read_parquet(spark, path).count()} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
