"""Worker-side imports must not depend on the driver's cwd (VERDICT r7 #2).

mapInPandas closures reference ``movie_genre_data_pipeline_spark`` by name and
the Python workers resolve that import from THEIR path, not the driver's cwd —
so before shipping.py, launching from any directory but the repo root killed
every Arrow-batched query with ModuleNotFoundError on the worker. These tests
pin (a) the zip layout is importable, (b) ensure_package_on_workers is
idempotent per context, and (c) the end-to-end property: a vanilla session
launched from an unrelated cwd runs a mapInPandas suite query.
"""

from __future__ import annotations

import subprocess
import sys
import zipfile

from movie_genre_data_pipeline_spark import shipping


def test_zip_contains_importable_package_layout():
    path = shipping._build_zip()
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
    assert "movie_genre_data_pipeline_spark/__init__.py" in names
    assert "movie_genre_data_pipeline_spark/shipping.py" in names
    # nested subpackages must keep their package path inside the archive
    assert "movie_genre_data_pipeline_spark/functions/multimodal.py" in names
    assert not any("__pycache__" in n for n in names)


def test_build_zip_is_cached_per_process():
    assert shipping._build_zip() == shipping._build_zip()


def test_ensure_is_idempotent_per_context(spark):
    shipping.ensure_package_on_workers(spark)
    before = set(shipping._shipped)
    shipping.ensure_package_on_workers(spark)
    assert set(shipping._shipped) == before


def test_mapinpandas_query_runs_from_foreign_cwd(tmp_path):
    """End-to-end repro of the r7 failure: vanilla session, driver cwd=/tmp-ish,
    run a mapInPandas query (media_features_full) — must import the package on
    the worker via the shipped zip, not the driver's cwd."""
    script = tmp_path / "probe.py"
    script.write_text(
        """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from movie_genre_data_pipeline_spark.suite import all_queries

fn = all_queries()["media_features_full"].fn
n = fn(spark, "/root/testdata/sf0.001").count()
print("ROWS", n)
assert n > 0
""".format(repo="/root/repo")
    )
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ROWS" in proc.stdout
