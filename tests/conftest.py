"""Shared fixtures: one local SparkSession per test session + movie-shaped raw JSON
fixture files per FIXTURES.md §1 (reconstructed from the fields the reference's
transforms touch — the reference ships no test data, SURVEY.md §5)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from movie_genre_data_pipeline_spark.config import Clock, PipelineConfig
from movie_genre_data_pipeline_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="mgdp-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark


def _movie(
    mid: int,
    title: str,
    budget: float = 500000.0,
    runtime: int = 120,
    language: str = "en",
    genres: list[tuple[int, str]] = ((1, "Action"),),
    created: str = "2020-01-15",
) -> dict:
    return {
        "Id": mid,
        "Title": title,
        "Overview": f"overview of {title}",
        "Tagline": f"tagline {mid}",
        "Budget": budget,
        "Revenue": budget * 2.5,
        "Price": 9.99,
        "RunTime": runtime,
        "ImdbUrl": f"https://imdb.example/{mid}",
        "TmdbUrl": f"https://tmdb.example/{mid}",
        "PosterUrl": f"https://img.example/p{mid}",
        "BackdropUrl": f"https://img.example/b{mid}",
        "OriginalLanguage": language,
        "ReleaseDate": "2020-06-01",
        "CreatedDate": created,
        "UpdatedDate": "2020-07-01",
        "CreatedBy": "tester",
        "UpdatedBy": "tester",
        "genres": [{"id": gid, "name": name} for gid, name in genres],
    }


@pytest.fixture()
def raw_movie_dir(tmp_path: Path) -> str:
    """Two multiline-JSON files with: duplicates within and across files, negative
    RunTime (quarantine), Budget < 100000 (floor), an empty genre name (drop)."""
    file1 = {
        "movie": [
            _movie(1, "Alpha", budget=50000.0, genres=[(1, "Action"), (2, "")]),
            _movie(2, "Beta", runtime=-90, language="fr", genres=[(3, "Drama")]),
            _movie(3, "Gamma", genres=[(1, "Action")]),
            _movie(3, "Gamma", genres=[(1, "Action")]),  # dup within file
        ]
    }
    file2 = {
        "movie": [
            _movie(3, "Gamma", genres=[(1, "Action")]),  # dup across files
            _movie(4, "Delta", runtime=-45, budget=80000.0, language="de",
                   genres=[(2, ""), (4, "Comedy")]),
            _movie(5, "Epsilon", language="fr", genres=[(3, "Drama"), (5, "Horror")]),
        ]
    }
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "movies_part1.json").write_text(json.dumps(file1))
    (raw / "movies_part2.json").write_text(json.dumps(file2))
    return str(raw)


@pytest.fixture()
def second_raw_movie_dir(tmp_path: Path) -> str:
    """A later ingest batch: one brand-new movie landing in the SAME
    p_CreatedDate partition as the first batch (regression for the
    overwrite-drops-prior-silver bug) plus a re-send of an already-loaded Id."""
    batch = {
        "movie": [
            _movie(6, "Zeta", genres=[(6, "SciFi")]),
            _movie(3, "Gamma", genres=[(1, "Action")]),  # already loaded in run 1
        ]
    }
    raw = tmp_path / "raw2"
    raw.mkdir()
    (raw / "movies_part3.json").write_text(json.dumps(batch))
    return str(raw)


@pytest.fixture()
def null_runtime_raw_dir(tmp_path: Path) -> str:
    """One clean movie + one with RunTime=null (JSON null): the reference's
    two-filter split (RunTime>=0 / NOT(RunTime>=0), operations.py:105-106) puts a
    NULL row in NEITHER branch — pinned so nobody 'fixes' it into double-counting."""
    movie = _movie(7, "Eta")
    null_rt = _movie(8, "Theta")
    null_rt["RunTime"] = None
    raw = tmp_path / "raw_null"
    raw.mkdir()
    (raw / "movies_null.json").write_text(json.dumps({"movie": [movie, null_rt]}))
    return str(raw)


@pytest.fixture()
def pipeline_config(tmp_path: Path) -> PipelineConfig:
    return PipelineConfig(
        root=str(tmp_path / "lake"),
        clock=Clock(fixed_utc="2024-01-01 00:00:00"),
    )
