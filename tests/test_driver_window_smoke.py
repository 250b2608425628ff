"""Fixture-drift gate (VERDICT r03 #4): every DRIVER_WINDOW query runs end-to-end
against the real driver fixtures AND matches its DuckDB oracle, so a regenerated
parquet fixture (schema drift, timestamp encoding change, value refresh) fails CI
before a snapshot ships — round 3 shipped 6 red driver rows that one local run
would have caught.

Runs at sf0.001 to keep CI time bounded; the encodings/schemas are identical
across SF dirs, so any drift the driver would see at sf0.01 appears here too.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from verify_local import verify_queries  # noqa: E402

from movie_genre_data_pipeline_spark.suite import DRIVER_WINDOW  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    not Path(SF_DIR).is_dir(), reason="driver fixtures not present"
)
def test_driver_window_green_on_fixtures(spark):
    failures = verify_queries(spark, SF_DIR, names=set(DRIVER_WINDOW))
    assert not failures, "\n".join(
        f"{name}: {'; '.join(errs)}" for name, errs in sorted(failures.items())
    )
