"""profile_columns: exact vs approx mode, null accounting, non-numeric handling."""

from __future__ import annotations

from movie_genre_data_pipeline_spark.operators.profile import profile_columns


def test_profile_exact_and_approx(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, 2.5), (3, "b", 2.5)],
        "k bigint, s string, v double",
    )
    rows = {
        r.col_name: r for r in profile_columns(df, ["k", "s", "v"]).collect()
    }
    assert rows["k"].n_nulls == 0 and rows["k"].n_distinct == 3
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_num is None and rows["s"].max_num is None
    assert rows["v"].n_nulls == 1 and rows["v"].n_distinct == 2
    assert rows["v"].min_num == 1.5 and rows["v"].max_num == 2.5

    # approx mode: HLL cardinalities are exact at these tiny counts; null
    # counts and ranges are computed identically in both modes
    arows = {
        r.col_name: r
        for r in profile_columns(df, ["k", "s", "v"], approx=True).collect()
    }
    for c in ("k", "s", "v"):
        assert arows[c].n_nulls == rows[c].n_nulls
        assert arows[c].n_distinct == rows[c].n_distinct
        assert arows[c].min_num == rows[c].min_num
        assert arows[c].max_num == rows[c].max_num
