"""Fixture-drift gate (VERDICT r03 #4): every DRIVER_WINDOW query runs end-to-end
against the real driver fixtures AND matches its DuckDB oracle, so a regenerated
parquet fixture (schema drift, timestamp encoding change, value refresh) fails CI
before a snapshot ships — round 3 shipped 6 red driver rows that one local run
would have caught.

Parameterized over BOTH fixture tiers the gate protects (VERDICT r04 #8):
sf0.001 (CI-cheap) and sf0.01 (the tier the driver actually scores), so a
regeneration of either is caught pre-snapshot — encodings have drifted
per-tier before (events.ts nanos→micros hit all tiers, but nothing forces a
future regeneration to be uniform).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from verify_local import verify_queries  # noqa: E402

from movie_genre_data_pipeline_spark.suite import DRIVER_WINDOW  # noqa: E402


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_driver_window_green_on_fixtures(spark, sf_dir):
    if not Path(sf_dir).is_dir():
        pytest.skip("driver fixtures not present")
    failures = verify_queries(spark, sf_dir, names=set(DRIVER_WINDOW))
    assert not failures, "\n".join(
        f"{name}: {'; '.join(errs)}" for name, errs in sorted(failures.items())
    )
