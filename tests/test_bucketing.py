"""Bucketed-table co-location: a join on the bucket key of two bucketed tables
must plan WITHOUT a shuffle on either side — the layout-reuse contract
write_bucketed_table exists for (SCALE.md §3)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.operators.writers import write_bucketed_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/bucketdb'"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    write_bucketed_table(orders, "bucketdb.orders_b", ["o_custkey"], 8)
    write_bucketed_table(customer, "bucketdb.customer_b", ["c_custkey"], 8)

    o = spark.table("bucketdb.orders_b")
    c = spark.table("bucketdb.customer_b")
    joined = o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "c_name")

    # tiny test tables would broadcast (hiding the layout effect); force the
    # shuffle-family join a 100 TB fact⋈fact would use
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # bucketing removed both shuffles
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and it computes the same rows as the unbucketed join
    expected = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "c_name")
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, expected.collect())
    )
