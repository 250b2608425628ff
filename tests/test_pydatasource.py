"""Custom Python DataSource (sources/pydatasource.py): schema, partitioned
parallel read, determinism vs partition count, option validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.sources.pydatasource import register


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_pydatasource_schema_and_rowcount(spark):
    df = _read(spark, n_rows=1000, n_users=50, partitions=4)
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value"]
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 4
    ids = df.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    assert tuple(ids) == (0, 999)


def test_pydatasource_partition_count_does_not_change_data(spark):
    a = _read(spark, n_rows=500, n_users=20, partitions=2)
    b = _read(spark, n_rows=500, n_users=20, partitions=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pydatasource_bounds(spark):
    df = _read(spark, n_rows=300, n_users=7, partitions=3)
    stats = df.agg(
        F.max("user_id").alias("mx"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count_distinct("event_type").alias("nt"),
    ).collect()[0]
    assert stats["mx"] < 7
    assert 0.0 <= stats["vmin"] and stats["vmax"] < 100.0
    assert stats["nt"] == 5


def test_pydatasource_invalid_options_raise(spark):
    with pytest.raises(Exception):
        _read(spark, n_rows=10, n_users=0).count()


def test_pydatasource_zero_rows(spark):
    assert _read(spark, n_rows=0).count() == 0


# -- jsonl_ledger writer (r5) -----------------------------------------------------------
def test_ledger_two_phase_commit_and_orphan_invisibility(spark, tmp_path):
    import json
    import os

    from movie_genre_data_pipeline_spark.sources.pydatasource import (
        read_ledger,
        register_ledger,
    )

    register_ledger(spark)
    path = str(tmp_path / "ledger")
    df = spark.createDataFrame(
        [(i, f"u{i % 3}") for i in range(100)], "id long, user string"
    ).repartition(4)
    df.write.format("jsonl_ledger").option("path", path).mode("append").save()

    manifest = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert sum(s["n_rows"] for s in manifest["shards"]) == 100
    assert len(manifest["shards"]) == 4  # one shard per partition

    # orphan shard (uncommitted writer) must not be visible
    with open(os.path.join(path, "part-orphan.jsonl"), "w") as f:
        f.write('{"id": 999, "user": "ghost"}\n')
    back = read_ledger(spark, path, "id long, user string")
    assert back.count() == 100
    assert back.filter("user = 'ghost'").count() == 0
    assert sorted(r["id"] for r in back.collect()) == list(range(100))


def test_ledger_append_merges_manifest_overwrite_resets(spark, tmp_path):
    """A second append must MERGE into the manifest (both writes visible);
    overwrite must reset it (only the new write visible)."""
    from movie_genre_data_pipeline_spark.sources.pydatasource import (
        read_ledger,
        register_ledger,
    )

    register_ledger(spark)
    path = str(tmp_path / "ledger")
    schema = "id long, user string"
    first = spark.createDataFrame([(i, f"u{i}") for i in range(10)], schema)
    second = spark.createDataFrame([(i, f"u{i}") for i in range(10, 25)], schema)
    first.write.format("jsonl_ledger").option("path", path).mode("append").save()
    second.write.format("jsonl_ledger").option("path", path).mode("append").save()
    back = read_ledger(spark, path, schema)
    assert sorted(r["id"] for r in back.collect()) == list(range(25))

    third = spark.createDataFrame([(100, "fresh")], schema)
    third.write.format("jsonl_ledger").option("path", path).mode("overwrite").save()
    assert [r["id"] for r in read_ledger(spark, path, schema).collect()] == [100]


def test_ledger_requires_path(spark):
    import pytest

    from movie_genre_data_pipeline_spark.sources.pydatasource import register_ledger

    register_ledger(spark)
    df = spark.range(3)
    with pytest.raises(Exception, match="path"):
        df.write.format("jsonl_ledger").mode("append").save()


def test_stream_source_offsets_and_replay(spark):
    """Offsets advance by rows_per_batch and cap at max_rows; ranges replay
    deterministically (the checkpoint-recovery contract)."""
    from movie_genre_data_pipeline_spark.sources.pydatasource import (
        _build_stream_datasource_class,
    )

    cls = _build_stream_datasource_class()
    reader = cls(options={"max_rows": "10", "rows_per_batch": "4"}).simpleStreamReader(None)
    off = reader.initialOffset()
    assert off == {"idx": 0}
    seen = []
    for expect_hi in (4, 8, 10, 10):
        it, off = reader.read(off)
        rows = list(it)
        seen.extend(rows)
        assert off == {"idx": expect_hi}
    assert [r[0] for r in seen] == list(range(10))
    # replay any committed range -> identical rows
    replay = list(reader.readBetweenOffsets({"idx": 2}, {"idx": 7}))
    assert replay == seen[2:7]
