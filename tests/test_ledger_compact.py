"""streaming/ledger.py — the append-only additive-fact ledger GC.

The contract (VERDICT r12 #5): compaction must be EXACT — for any later
appends `suffix`, fold(compact(prefix) ∪ suffix) == fold(prefix ∪ suffix) —
while actually reclaiming the shard pile (fewer files afterwards) and
preserving the ledger schema its appenders write (SUM widens int→bigint; a
drifted dtype would make the next fold union mixed schemas).
"""

from __future__ import annotations

from pathlib import Path

from movie_genre_data_pipeline_spark.streaming.ledger import (
    compact_ledger,
    fold_ledger,
)


def _files(path: str) -> int:
    return sum(1 for p in Path(path).rglob("*.parquet") if p.is_file())


def _append(spark, path: str, rows, n_shards: int = 4) -> None:
    df = spark.createDataFrame(rows, "k bigint, grp string, v bigint")
    df.repartition(n_shards).write.mode("append").parquet(path)


def _readout(spark, path: str):
    df = spark.read.parquet(path)
    return sorted(
        (r["k"], r["grp"], r["v"])
        for r in fold_ledger(df, ["k", "grp"], ["v"]).collect()
    )


def test_fold_then_append_equals_append_only(spark, tmp_path):
    prefix = [(i % 7, f"g{i % 3}", i) for i in range(100)]
    suffix = [(i % 5, f"g{i % 3}", 10 * i) for i in range(40)]

    # append-only twin: prefix + suffix, never compacted
    plain = str(tmp_path / "plain")
    _append(spark, plain, prefix)
    _append(spark, plain, suffix)

    # compacted twin: prefix (in shards), compact, then the same suffix
    gc = str(tmp_path / "gc")
    for chunk in (prefix[:30], prefix[30:60], prefix[60:]):
        _append(spark, gc, chunk)
    before = _files(gc)
    after = compact_ledger(spark, gc, ["k", "grp"], ["v"])
    assert after == _files(gc)
    assert after < before, f"compaction did not shrink the pile: {before}->{after}"
    _append(spark, gc, suffix)

    assert _readout(spark, gc) == _readout(spark, plain)


def test_compaction_is_idempotent_and_repeatable(spark, tmp_path):
    path = str(tmp_path / "led")
    _append(spark, path, [(1, "a", 5), (2, "b", 7)])
    _append(spark, path, [(1, "a", 3), (3, "c", 1)])
    expected = _readout(spark, path)
    compact_ledger(spark, path, ["k", "grp"], ["v"])
    assert _readout(spark, path) == expected
    # compact again with nothing new appended — still exact, still readable
    compact_ledger(spark, path, ["k", "grp"], ["v"])
    assert _readout(spark, path) == expected
    # interleave: append → compact → append → compact → append
    _append(spark, path, [(2, "b", -7), (9, "z", 4)])
    compact_ledger(spark, path, ["k", "grp"], ["v"])
    _append(spark, path, [(9, "z", 6)])
    assert _readout(spark, path) == sorted(
        [(1, "a", 8), (2, "b", 0), (3, "c", 1), (9, "z", 10)]
    )


def test_fold_preserves_ledger_dtypes(spark):
    df = spark.createDataFrame([(1, 2), (1, 3)], "k bigint, v int")
    folded = fold_ledger(df, ["k"], ["v"])
    assert dict(folded.dtypes) == {"k": "bigint", "v": "int"}
    assert folded.collect()[0]["v"] == 5


def test_compacted_schema_matches_appender_schema(spark, tmp_path):
    path = str(tmp_path / "led")
    _append(spark, path, [(1, "a", 5)])
    schema_before = spark.read.parquet(path).dtypes
    compact_ledger(spark, path, ["k", "grp"], ["v"])
    assert spark.read.parquet(path).dtypes == schema_before
    # and an appender writing the original schema still unions cleanly
    _append(spark, path, [(1, "a", 2)])
    assert _readout(spark, path) == [(1, "a", 7)]
