"""Physical-plan shape regression tests: the scale properties SCALE.md claims
(pushdown, pruning, broadcasts, no nested-loop range joins) must survive code
changes, not just hold the day they were checked. explain() needs analysis only
— these are fast."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from movie_genre_data_pipeline_spark.suite import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_tpch_q1_pushdown_and_pruning(spark):
    plan = _plan(spark, "tpch_q1")
    # filter reaches the parquet scan
    assert "LessThanOrEqual(l_shipdate" in plan, plan
    # column pruning: lineitem has 16 columns, the query needs 7
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert read_schema.count(",") == 6, read_schema  # 7 of 16 lineitem columns
    # map-side combine before the single exchange
    assert "partial_sum" in plan, plan


def test_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "star_join")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan


def test_asof_join_has_no_join_node(spark):
    # union+window formulation: there must be NO join operator of any kind
    plan = _plan(spark, "asof_join")
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_interval_join_no_nested_loop(spark):
    plan = _plan(spark, "interval_join")
    assert "NestedLoop" not in plan, plan
    assert "Generate explode" in plan or "Generate" in plan, plan


def test_quarantine_filter_pushed(spark):
    plan = _plan(spark, "quarantine_clean")
    assert "PushedFilters" in plan and "l_quantity" in plan, plan


def test_partition_pruning_on_p_ingestdate(spark, tmp_path):
    """The medallion p_* partition convention must actually prune: a filtered
    scan of a date-partitioned table reads only matching partitions."""
    from pyspark.sql import functions as F

    ev = all_queries()["lit_enrich"].fn(spark, SF_DIR).limit(0)  # warm import
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice", F.to_date("o_orderdate").alias("p_date")
    )
    path = str(tmp_path / "part_orders")
    src.write.partitionBy("p_date").parquet(path)
    one_day = src.select(F.max("p_date")).collect()[0][0]

    df = spark.read.parquet(path).filter(F.col("p_date") == F.lit(one_day))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    part_filters = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_filters and "p_date" in part_filters[0], plan
