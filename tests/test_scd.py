"""SCD Type-2 semantics pins: interval chaining, no-op collapse, new-key /
no-update keys, NULL attribute transitions, out-of-order splice, and the
single-shuffle plan shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row, functions as F

from movie_genre_data_pipeline_spark.operators.scd import scd2_apply


def _df(spark, rows, ts_cols=("eff_from",)):
    df = spark.createDataFrame(rows)
    for c in ts_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _hist(spark, current_rows, update_rows):
    cur = _df(spark, current_rows)
    ups = _df(spark, update_rows)
    out = scd2_apply(cur, ups, ["k"], ["attr"], "eff_from")
    return sorted(
        (r["k"], r["attr"], str(r["eff_from"]), str(r["eff_to"]), r["is_current"])
        for r in out.collect()
    )


def test_scd2_chains_intervals_and_collapses_noops(spark):
    cur = [Row(k=1, attr="A", eff_from="2020-01-01")]
    ups = [
        Row(k=1, attr="B", eff_from="2020-02-01"),
        Row(k=1, attr="B", eff_from="2020-03-01"),  # no-op: collapses away
        Row(k=1, attr="C", eff_from="2020-04-01"),
    ]
    got = _hist(spark, cur, ups)
    assert got == [
        (1, "A", "2020-01-01 00:00:00", "2020-02-01 00:00:00", False),
        (1, "B", "2020-02-01 00:00:00", "2020-04-01 00:00:00", False),
        (1, "C", "2020-04-01 00:00:00", "None", True),
    ]


def test_scd2_new_key_and_untouched_key(spark):
    cur = [Row(k=1, attr="A", eff_from="2020-01-01")]
    ups = [Row(k=2, attr="X", eff_from="2021-06-01")]
    got = _hist(spark, cur, ups)
    assert got == [
        (1, "A", "2020-01-01 00:00:00", "None", True),
        (2, "X", "2021-06-01 00:00:00", "None", True),
    ]


def test_scd2_null_transitions_are_versions_null_to_null_is_noop(spark):
    schema = "k int, attr string, eff_from string"
    cur = _df(spark, [Row(k=1, attr="A", eff_from="2020-01-01")])
    ups = spark.createDataFrame(
        [(1, None, "2020-02-01"), (1, None, "2020-03-01"), (1, "B", "2020-04-01")],
        schema,
    ).withColumn("eff_from", F.col("eff_from").cast("timestamp"))
    out = scd2_apply(cur, ups, ["k"], ["attr"], "eff_from")
    got = sorted(
        (str(r["eff_from"]), r["attr"], r["is_current"]) for r in out.collect()
    )
    # A -> NULL (real version) -> (NULL no-op dropped) -> B
    assert got == [
        ("2020-01-01 00:00:00", "A", False),
        ("2020-02-01 00:00:00", None, False),
        ("2020-04-01 00:00:00", "B", True),
    ]


def test_scd2_out_of_order_update_splices(spark):
    cur = [Row(k=1, attr="A", eff_from="2020-01-01")]
    ups = [
        Row(k=1, attr="C", eff_from="2020-06-01"),
        Row(k=1, attr="B", eff_from="2020-03-01"),  # late-arriving middle version
    ]
    got = _hist(spark, cur, ups)
    assert got == [
        (1, "A", "2020-01-01 00:00:00", "2020-03-01 00:00:00", False),
        (1, "B", "2020-03-01 00:00:00", "2020-06-01 00:00:00", False),
        (1, "C", "2020-06-01 00:00:00", "None", True),
    ]


def test_scd2_single_key_exchange(spark):
    """Both windows (lag collapse + lead interval) must share one shuffle."""
    cur = _df(spark, [Row(k=1, attr="A", eff_from="2020-01-01")])
    ups = _df(spark, [Row(k=1, attr="B", eff_from="2020-02-01")])
    plan = (
        scd2_apply(cur, ups, ["k"], ["attr"], "eff_from")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_scd2_empty_cols_raise(spark):
    df = _df(spark, [Row(k=1, attr="A", eff_from="2020-01-01")])
    with pytest.raises(ValueError):
        scd2_apply(df, df, [], ["attr"])
    with pytest.raises(ValueError):
        scd2_apply(df, df, ["k"], [])


# -- incremental maintenance ------------------------------------------------------------
def _rows_set(df):
    return sorted(
        (r["k"], r["attr"], str(r["eff_from"]), str(r["eff_to"]), r["is_current"])
        for r in df.collect()
    )


def test_scd2_incremental_equals_batch(spark):
    """Splitting the update stream at ANY point and applying the tail
    incrementally must reproduce the full-batch history exactly — including
    late updates that splice into already-persisted intervals, untouched keys
    passing through, and brand-new keys arriving in the increment."""
    from movie_genre_data_pipeline_spark.operators.scd import scd2_apply_incremental

    cur = _df(
        spark,
        [
            Row(k=1, attr="A", eff_from="2020-01-01"),
            Row(k=2, attr="X", eff_from="2020-01-01"),
            Row(k=3, attr="Q", eff_from="2020-01-01"),  # untouched key
        ],
    )
    ups_rows = [
        Row(k=1, attr="B", eff_from="2020-04-01"),
        Row(k=1, attr="B", eff_from="2020-05-01"),  # no-op redelivery
        Row(k=2, attr="Y", eff_from="2020-02-01"),
        Row(k=1, attr="C", eff_from="2020-06-01"),
        Row(k=1, attr="A2", eff_from="2020-02-15"),  # late splice (pre-split era)
        Row(k=4, attr="N", eff_from="2020-07-01"),  # new key in the increment
    ]
    batch = scd2_apply(cur, _df(spark, ups_rows), ["k"], ["attr"], "eff_from")
    for split in ("2020-03-01", "2020-05-15", "2021-01-01"):
        early = [r for r in ups_rows if r.eff_from < split]
        late = [r for r in ups_rows if r.eff_from >= split]
        hist = scd2_apply(
            cur,
            _df(spark, early) if early else _df(spark, ups_rows).limit(0),
            ["k"],
            ["attr"],
            "eff_from",
        )
        inc = scd2_apply_incremental(
            hist,
            _df(spark, late) if late else _df(spark, ups_rows).limit(0),
            ["k"],
            ["attr"],
            "eff_from",
        )
        assert _rows_set(inc) == _rows_set(batch), split


def test_scd2_incremental_nonmonotone_counterexample_and_log_fix(spark):
    """The collapse-splice hazard: a no-op version dropped from persisted
    history is unrecoverable, so an OLDER update arriving in a later batch
    diverges from the batch derivation — while the log-based rebuild
    (scd2_apply_incremental_log) stays exact under any order."""
    from movie_genre_data_pipeline_spark.operators.scd import (
        scd2_apply_incremental,
        scd2_apply_incremental_log,
    )

    cur = _df(spark, [Row(k=1, attr="A", eff_from="2020-01-01")])
    # batch 1 delivers A@2020-06-01 (a no-op vs the BASE run -> collapsed away);
    # batch 2 delivers B@2020-03-01, which splices BEFORE it and should make
    # the 2020-06-01 A a REAL flip back
    b1 = [Row(k=1, attr="A", eff_from="2020-06-01")]
    b2 = [Row(k=1, attr="B", eff_from="2020-03-01")]
    batch = scd2_apply(cur, _df(spark, b1 + b2), ["k"], ["attr"], "eff_from")
    assert len(_rows_set(batch)) == 3  # A, B, A — the flip-back survives

    hist1 = scd2_apply_incremental(
        scd2_apply(cur, _df(spark, b1).limit(0), ["k"], ["attr"], "eff_from"),
        _df(spark, b1),
        ["k"],
        ["attr"],
        "eff_from",
    )
    plain = scd2_apply_incremental(hist1, _df(spark, b2), ["k"], ["attr"], "eff_from")
    # documented divergence: the collapsed no-op cannot be restored
    assert _rows_set(plain) != _rows_set(batch)

    # log-based: seed log with the base version, append each batch before rebuild
    log1 = _df(spark, [Row(k=1, attr="A", eff_from="2020-01-01")] + b1)
    histL1 = scd2_apply_incremental_log(
        scd2_apply(cur, _df(spark, b1).limit(0), ["k"], ["attr"], "eff_from"),
        log1,
        _df(spark, b1),
        ["k"],
        ["attr"],
        "eff_from",
    )
    log2 = _df(spark, [Row(k=1, attr="A", eff_from="2020-01-01")] + b1 + b2)
    histL2 = scd2_apply_incremental_log(
        histL1, log2, _df(spark, b2), ["k"], ["attr"], "eff_from"
    )
    assert _rows_set(histL2) == _rows_set(batch)


def test_scd2_point_in_time_join_covers_each_fact_exactly_once(spark):
    """PIT semantics: [eff_from, eff_to) half-open — a fact ON the upgrade
    timestamp takes the NEW version; any timestamp >= the key's first
    eff_from matches exactly one version; timestamps before it match none."""
    from movie_genre_data_pipeline_spark.operators.scd import (
        scd2_apply,
        scd2_point_in_time_join,
    )

    cur = _df(spark, [Row(k=1, attr="A", eff_from="2020-01-01")])
    ups = _df(
        spark,
        [
            Row(k=1, attr="B", eff_from="2020-02-01"),
            Row(k=1, attr="C", eff_from="2020-03-01"),
        ],
    )
    hist = scd2_apply(cur, ups, ["k"], ["attr"], "eff_from")
    facts = _df(
        spark,
        [
            Row(k=1, ts="2019-12-31"),  # before history: no match
            Row(k=1, ts="2020-01-15"),  # A
            Row(k=1, ts="2020-02-01"),  # boundary: new version B, not A
            Row(k=1, ts="2020-02-28"),  # B
            Row(k=1, ts="2020-03-01"),  # boundary: C
            Row(k=1, ts="2025-01-01"),  # open current version C
        ],
        ts_cols=("ts",),
    )
    got = {
        str(r["ts"])[:10]: r["attr"]
        for r in scd2_point_in_time_join(facts, hist, ["k"], "ts").collect()
    }
    assert got == {
        "2020-01-15": "A",
        "2020-02-01": "B",
        "2020-02-28": "B",
        "2020-03-01": "C",
        "2025-01-01": "C",
    }
    # exactly-once: 5 covered facts -> 5 rows (no double-match at boundaries)
    assert scd2_point_in_time_join(facts, hist, ["k"], "ts").count() == 5
