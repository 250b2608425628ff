"""Relational extensions beyond the reference's surface (SURVEY.md §2.5/§2.7 notes:
the reference has no groupBy/window/join/top-k — the driver contract and north star
require them). All idiomatic DataFrame API; dims go through broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.text import ALPHA_TOKS_SQL
from movie_genre_data_pipeline_spark.suite import QuerySpec, load


# -- TPC-H Q1-style aggregate -------------------------------------------------
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                    * (F.lit(1.0) + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q_TPCH_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# -- star join over broadcast dims ---------------------------------------------
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation ⋈ region, revenue per region/nation. nation and
    region are broadcast explicitly (small dims; SURVEY.md §4 join strategy)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


Q_STAR_JOIN_ORACLE = """
SELECT r_name, n_name,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# -- semi / anti joins -----------------------------------------------------------
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_semi").select("c_custkey", "c_mktsegment")


Q_SEMI_JOIN_ORACLE = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# -- top-k (global sort + limit) ----------------------------------------------------
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-25 (total tiebreak on the key) — O1 + the limit the
    reference lacks."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .limit(25)
    )


Q_TOPK_ORDERS_ORACLE = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""


# -- window: top-k per group ----------------------------------------------------------
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("o_custkey", "o_orderkey", "rnk")
    )


Q_WINDOW_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, rnk FROM (
  SELECT o_custkey, o_orderkey,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
  FROM orders
) t WHERE rnk <= 2
"""


# -- window: running sum ----------------------------------------------------------------
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


Q_WINDOW_RUNNING_SUM_ORACLE = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
"""


# -- window: lag/lead delta ----------------------------------------------------------------
def q_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value", 1).over(w), 4).alias("delta"),
    )


Q_WINDOW_LAG_DELTA_ORACLE = """
SELECT user_id, event_id,
       ROUND(value - LAG(value, 1) OVER (PARTITION BY user_id
             ORDER BY ts ASC, event_id ASC), 4) AS delta
FROM events
"""


# -- pivot ------------------------------------------------------------------------------
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


Q_PIVOT_ORACLE = """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
FROM lineitem GROUP BY l_returnflag
"""


# -- rollup / cube ---------------------------------------------------------------------
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n",
        )
    )


Q_ROLLUP_ORACLE = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "total",
        )
    )


Q_CUBE_ORACLE = """
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(o_orderpriority, '<all>') AS priority,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# -- set operations -----------------------------------------------------------------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(big spenders UNION negative balances) EXCEPT auto segment."""
    c = load(spark, sf_dir, "customer")
    big = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    neg = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    return big.union(neg).distinct().exceptAll(auto.distinct())


Q_SET_OPS_ORACLE = """
(SELECT c_custkey FROM customer WHERE c_acctbal > 5000
 UNION
 SELECT c_custkey FROM customer WHERE c_acctbal < 0)
EXCEPT ALL
SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
"""


# -- union by name (schema-evolution union) -------------------------------------------
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True) — the schema-drift union a medallion
    bronze layer needs when a new batch gains/loses columns: positions differ,
    one side lacks a column (null-filled), names align the rest."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    b = o.filter(F.col("o_orderstatus") == "F").select("o_totalprice", "o_orderkey")
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


Q_UNION_BY_NAME_ORACLE = """
WITH u AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderstatus = 'O'
  UNION ALL BY NAME
  SELECT o_totalprice, o_orderkey FROM orders WHERE o_orderstatus = 'F'
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM u GROUP BY o_orderpriority
"""


# -- intersect ------------------------------------------------------------------------------
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return li.select(F.col("l_orderkey").alias("okey")).intersect(
        o.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderkey").alias("okey"))
    )


Q_INTERSECT_ORACLE = """
SELECT l_orderkey AS okey FROM lineitem
INTERSECT
SELECT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'O'
"""


# -- exact distinct counts ----------------------------------------------------------------
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


Q_COUNT_DISTINCT_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
FROM lineitem GROUP BY l_returnflag
"""


# -- from_json over events.props -------------------------------------------------------------
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column processing (SURVEY.md §2.3 note: ships from_json for events.props)."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k", F.from_json("props", "k INT").getField("k")
    )
    return parsed.groupBy("event_type").agg(
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


Q_FROM_JSON_ORACLE = """
SELECT event_type,
       ROUND(AVG(CAST(props->>'k' AS INTEGER)), 4) AS avg_k,
       CAST(MAX(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS max_k
FROM events GROUP BY event_type
"""


# -- sessionization (gap > 30 min) -------------------------------------------------------------
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag + cumulative gap counter (pyspark_guide 'common
    OLAP patterns'); the streaming variant uses session_window (streaming_queries)."""
    from movie_genre_data_pipeline_spark.operators.timeseries import epoch_seconds

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # fractional epoch seconds (micros/1e6 as double) — matches DuckDB's EPOCH()
    gap = epoch_seconds("ts") - F.lag(epoch_seconds("ts"), 1).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sessions = ev.withColumn("session_seq", F.sum(new_session).over(w))
    return sessions.groupBy("user_id").agg(
        F.max("session_seq").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


Q_SESSIONIZE_ORACLE = """
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM gaps GROUP BY user_id
"""


# -- tumbling window (batch form; streaming twin in streaming_queries) ------------------------
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    win = F.window("ts", "6 hours")
    return (
        ev.groupBy(
            F.date_format(win.start, "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


Q_TUMBLING_WINDOW_ORACLE = """
SELECT strftime(make_timestamp(CAST(FLOOR(EPOCH(ts) / 21600) * 21600 AS BIGINT) * 1000000),
                '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


# -- sliding window (overlapping event-time buckets) ----------------------------------
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour windows sliding every 3 hours: each event lands in exactly two
    overlapping buckets. Spark's window() duplicates rows window-side before the
    partial agg, so it stays one shuffle; the oracle expands the same two buckets
    with UNNEST."""
    ev = load(spark, sf_dir, "events")
    win = F.window("ts", "6 hours", "3 hours")
    return (
        ev.groupBy(
            F.date_format(win.start, "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


Q_SLIDING_WINDOW_ORACLE = """
SELECT strftime(make_timestamp((CAST(FLOOR(EPOCH(ts) / 10800) AS BIGINT) - k) * 10800 * 1000000),
                '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events, UNNEST([0, 1]) AS t(k)
GROUP BY 1, 2
"""


# -- anti join: customers with no orders ----------------------------------------------
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti — the NOT EXISTS shape (and the core of the upsert insert path):
    customers who never placed a big-ticket order. The price filter is pushed to
    the orders scan BEFORE the anti-join; one shuffle on the key, and AQE
    broadcasts the filtered side when it fits."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name")


Q_ANTI_JOIN_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
"""


# -- statistical aggregates: stddev / variance / correlation / covariance -------------
def q_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregate family per group. Columns are chosen small-
    magnitude (quantity 1-50, discount 0-0.1) so cross-engine accumulation-order
    noise (~1e-12 relative) stays far below the 6dp rounding; corr is
    dimensionless and safe by construction."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
    )


Q_STATS_AGGREGATES_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
       ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS cov_qty_disc
FROM lineitem GROUP BY l_returnflag
"""


# -- Arrow-vectorized scalar Pandas UDF ------------------------------------------------
def q_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar @pandas_udf feature transforms (functions/vectorized.py): whole
    Arrow batches per call, NumPy math inside — the fast Python path when an
    expression can't stay JVM-side. Per-row outputs are rounded to 6dp so libm
    ulp differences vs DuckDB vanish."""
    from movie_genre_data_pipeline_spark.functions.vectorized import (
        log_damped_value,
        signed_sqrt,
    )

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(log_damped_value("value"), 6).alias("log_damped"),
        F.round(signed_sqrt(F.col("value") - F.lit(100.0)), 6).alias("ssqrt_centered"),
    )


Q_PANDAS_SCALAR_UDF_ORACLE = """
SELECT event_id,
       ROUND(LN(1.0 + value), 6) AS log_damped,
       ROUND(SIGN(value - 100.0) * SQRT(ABS(value - 100.0)), 6) AS ssqrt_centered
FROM events
"""


# -- posexplode: position-aware un-nesting --------------------------------------------
def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — the position-preserving UDTF the reference's explode family
    lacks (SURVEY.md §2.3 P5): token position matters for n-gram/window features
    downstream. Narrow op, scan-pipelined, no shuffle at all."""
    from movie_genre_data_pipeline_spark.functions.text import alpha_tokens

    d = load(spark, sf_dir, "documents")
    toks = alpha_tokens("text")
    return d.select(
        "doc_id", F.posexplode(toks).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")


Q_POSEXPLODE_TOKENS_ORACLE = """
WITH docs AS (
  SELECT doc_id, __ALPHA_TOKS__ AS toks
  FROM documents
)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
FROM docs, UNNEST(generate_series(1, len(toks))) AS t(i)
""".replace("__ALPHA_TOKS__", ALPHA_TOKS_SQL)


# -- generated range source -----------------------------------------------------------
def q_range_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.range — the parallel generated source (no files): each executor
    synthesizes its id sub-range, so construction is O(n/parallelism) with zero
    I/O; one partial-agg shuffle on the 7 residue groups."""
    r = spark.range(0, 1_000_000)
    return (
        r.groupBy((F.col("id") % 7).alias("residue"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").alias("total"),
            F.sum(F.col("id") * F.col("id")).alias("total_sq"),
        )
    )


Q_RANGE_SOURCE_ORACLE = """
SELECT i % 7 AS residue,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(i) AS BIGINT) AS total,
       CAST(SUM(i * i) AS BIGINT) AS total_sq
FROM generate_series(0, 999999) t(i)
GROUP BY 1
"""


# -- column profiling (data-quality summary pass) -------------------------------------
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/profile.py:profile_columns over orders — nulls, cardinality,
    numeric ranges in ONE scan + unpivot, the pre-ingest trust check."""
    from movie_genre_data_pipeline_spark.operators.profile import profile_columns

    o = load(spark, sf_dir, "orders")
    return profile_columns(
        o, ["o_orderstatus", "o_orderpriority", "o_totalprice", "o_custkey"]
    ).select(
        "col_name",
        "n_nulls",
        "n_distinct",
        F.round("min_num", 2).alias("min_num"),
        F.round("max_num", 2).alias("max_num"),
    )


Q_PROFILE_TABLE_ORACLE = """
SELECT 'o_orderstatus' AS col_name,
       CAST(COUNT(*) FILTER (o_orderstatus IS NULL) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
       NULL::DOUBLE AS min_num, NULL::DOUBLE AS max_num
FROM orders
UNION ALL
SELECT 'o_orderpriority',
       CAST(COUNT(*) FILTER (o_orderpriority IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
       NULL::DOUBLE, NULL::DOUBLE
FROM orders
UNION ALL
SELECT 'o_totalprice',
       CAST(COUNT(*) FILTER (o_totalprice IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
       ROUND(MIN(o_totalprice), 2), ROUND(MAX(o_totalprice), 2)
FROM orders
UNION ALL
SELECT 'o_custkey',
       CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       ROUND(CAST(MIN(o_custkey) AS DOUBLE), 2), ROUND(CAST(MAX(o_custkey) AS DOUBLE), 2)
FROM orders
"""


# -- map-typed columns: build, filter, explode ----------------------------------------
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip — the one complex type the reference never touches
    (SURVEY.md §1.3: 'boolean/map/decimal/interval not used'): per-user
    event_type→count map via map_from_entries(collect_list(struct)), pruned
    with map_filter (counts > 3), exploded back to rows. Maps never leave the
    executor as opaque blobs — the comparison surface is plain rows."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    maps = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    pruned = maps.select(
        "user_id",
        F.map_filter("type_counts", lambda k, v: v > 3).alias("type_counts"),
    )
    return pruned.select(
        "user_id", F.explode("type_counts").alias("event_type", "n")
    )


Q_MAP_FUNCTIONS_ORACLE = """
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY user_id, event_type HAVING COUNT(*) > 3
"""


# -- ranking-function suite -------------------------------------------------------------
def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile / cume_dist in one window —
    the full ranking-function family over (nation, acctbal).

    percent_rank/cume_dist are k/(n-1) and k/n ratios: rounding them to a fixed
    scale hits EXACT decimal-half boundaries whenever the partition size divides
    2·10^scale (sf0.1's nation partitions are 640 rows: k/640·1e6 = k·1562.5 —
    exact halves for odd k, where Spark's HALF_UP and DuckDB's rounding diverge).
    So the suite recovers the integer numerators instead — multiplying back by
    (n-1)/n gives values within 1e-10 of an integer at any SF, making the check
    EXACT and boundary-free."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    part = Window.partitionBy("c_nationkey")
    n = F.count(F.lit(1)).over(part)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w) * (n - F.lit(1)))
        .cast("bigint")
        .alias("prnk_num"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.cume_dist().over(w) * n).cast("bigint").alias("cume_n"),
    )


Q_WINDOW_RANK_SUITE_ORACLE = """
SELECT c_custkey, c_nationkey,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       CAST(ROUND(PERCENT_RANK() OVER w * (COUNT(*) OVER p - 1)) AS BIGINT) AS prnk_num,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       CAST(ROUND(CUME_DIST() OVER w * COUNT(*) OVER p) AS BIGINT) AS cume_n
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC),
       p AS (PARTITION BY c_nationkey)
"""


# -- scalar function families: dates and strings ----------------------------------------
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic + string functions the reference never needed
    (SURVEY.md §2.3 'no string functions, no date arithmetic') but any
    engine-switcher will: trunc/extract/datediff/add_months, upper/substr/
    concat/lpad/regexp_extract/like."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_eoy"),
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.concat_ws("#", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded_key"),
        F.regexp_extract("o_orderpriority", r"^(\d+)-", 1).alias("prio_num"),
        F.col("o_orderpriority").like("%URGENT%").alias("is_urgent"),
    )


Q_SCALAR_FUNCTIONS_ORACLE = """
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate::TIMESTAMP), '%Y-%m-%d') AS month_start,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
       CAST(date_diff('day', o_orderdate::DATE, DATE '1998-12-31') AS BIGINT) AS days_to_eoy,
       upper(substring(o_orderpriority, 1, 3)) AS prio3,
       concat_ws('#', o_orderstatus, o_orderpriority) AS status_prio,
       lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded_key,
       COALESCE(regexp_extract(o_orderpriority, '^(\\d+)-', 1), '') AS prio_num,
       (o_orderpriority LIKE '%URGENT%') AS is_urgent
FROM orders
"""


# -- array higher-order functions -------------------------------------------------------
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / exists / aggregate / slice / sort over the embedding
    arrays — the JVM higher-order-function family (these are what keep array
    logic out of Python UDFs at scale)."""
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size(v).alias("dim"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 6).alias("vec_sum"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.exists(v, lambda x: x > 0.5).alias("has_large"),
        F.round(F.element_at(F.array_sort(v), -1), 6).alias("max_component"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head8_sum"),
    )


Q_ARRAY_FUNCTIONS_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id,
       CAST(len(v) AS INTEGER) AS dim,
       ROUND(list_aggregate(v, 'sum'), 6) AS vec_sum,
       CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_positive,
       (len(list_filter(v, x -> x > 0.5)) > 0) AS has_large,
       ROUND(list_aggregate(v, 'max'), 6) AS max_component,
       ROUND(list_aggregate(v[1:8], 'sum'), 6) AS head8_sum
FROM e
"""


# -- null handling: nullif / coalesce / fillna ------------------------------------------
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleansing null family the reference never needed: nullif to mint
    nulls, coalesce/fillna to repair them, plus per-column null accounting."""
    c = load(spark, sf_dir, "customer")
    nulled = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal_or_null"),
    )
    repaired = nulled.fillna({"seg_or_null": "UNKNOWN"}).withColumn(
        "bal_filled", F.coalesce("bal_or_null", F.lit(0.0))
    )
    return repaired.groupBy("seg_or_null").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("bal_or_null").isNull().cast("bigint")).alias("n_null_bal"),
        F.round(F.sum("bal_filled"), 2).alias("total_bal_filled"),
    )


Q_NULL_HANDLING_ORACLE = """
SELECT COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS seg_or_null,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_bal,
       ROUND(SUM(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END), 2) AS total_bal_filled
FROM customer
GROUP BY 1
"""


# -- data profiling: exact group percentiles ------------------------------------------
def q_profile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile profile per group (Spark `percentile` — sort-based,
    linear interpolation; DuckDB `quantile_cont` computes the identical
    statistic). The exact twin of the sketch path in sketch_approx_stats."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95"),
    )


Q_PROFILE_PERCENTILES_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95
FROM lineitem GROUP BY l_returnflag
"""


# -- applyInPandas grouped-map: per-group min-max normalization ------------------------
def q_grouped_pandas_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map `applyInPandas`: per-user min-max normalization of event
    values — the custom-per-group-transform escape hatch (Arrow batches, one
    shuffle on the group key). (v - min) / (max - min) uses the exact same two
    doubles in every engine, so results round-trip bit-for-bit at 6dp."""
    import pandas as pd

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def norm_group(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["value"].min(), pdf["value"].max()
        rng = hi - lo
        pdf["value_norm"] = (
            ((pdf["value"] - lo) / rng) if rng > 0 else 0.0
        )
        return pdf[["user_id", "event_id", "value_norm"]]

    out = ev.groupBy("user_id").applyInPandas(
        norm_group, "user_id long, event_id long, value_norm double"
    )
    return out.select(
        "user_id", "event_id", F.round("value_norm", 6).alias("value_norm")
    )


Q_GROUPED_PANDAS_NORM_ORACLE = """
SELECT user_id, event_id,
       ROUND(CASE WHEN MAX(value) OVER w = MIN(value) OVER w THEN 0.0
                  ELSE (value - MIN(value) OVER w)
                       / (MAX(value) OVER w - MIN(value) OVER w) END,
             6) AS value_norm
FROM events
WINDOW w AS (PARTITION BY user_id)
"""


# -- sketches: approximate distinct + quantiles ---------------------------------------
def q_sketch_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for 100 TB profiling: DataSketches HLL distinct-count,
    HLL-merge via approx_count_distinct, and approx_percentile (KLL-style
    quantiles). Sketch internals differ engine-to-engine, so the ORACLE is a
    bounds check (VERDICT r01 #4): the query emits the exact values plus
    within-error booleans (HLL ±5%, approx_count_distinct ±10% at rsd=0.05,
    approx median between the exact 48th and 52nd percentiles — all far looser
    than the sketches' documented error), and DuckDB asserts the exact values
    and that every flag is TRUE. Sketches are hash-deterministic (no RNG), so
    the flags are stable run-to-run."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("__exact_parts"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))").alias("__hll"),
        F.approx_count_distinct("l_partkey").alias("__acd"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("__amed"),
        F.expr("percentile(l_extendedprice, 0.48)").alias("__p48"),
        F.expr("percentile(l_extendedprice, 0.52)").alias("__p52"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("__hll") - F.col("exact_orders"))
            <= 0.05 * F.col("exact_orders")
        ).alias("hll_within_5pct"),
        (
            F.abs(F.col("__acd") - F.col("__exact_parts"))
            <= 0.10 * F.col("__exact_parts")
        ).alias("acd_within_10pct"),
        (
            (F.col("__amed") >= F.col("__p48")) & (F.col("__amed") <= F.col("__p52"))
        ).alias("median_within_rank_2pct"),
    )


Q_SKETCH_APPROX_STATS_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS hll_within_5pct,
       TRUE AS acd_within_10pct,
       TRUE AS median_within_rank_2pct
FROM lineitem GROUP BY l_returnflag
"""


# -- interval (range) join: purchases inside post-error windows -----------------------
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via interval bucketing (operators/interval.py): every purchase
    within 30 minutes after an error by the same user. Equi-join on
    (user, time-bucket) + residual filter — no nested-loop non-equi join."""
    from movie_genre_data_pipeline_spark.operators.interval import interval_join
    from movie_genre_data_pipeline_spark.operators.timeseries import epoch_millis

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    windows = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("w_start"),
        (F.timestamp_millis(epoch_millis("ts") + 30 * 60 * 1000)).alias("w_end"),
        F.col("event_id").alias("error_id"),
    )
    out = interval_join(
        purchases, windows, ["user_id"], "p_ts", "w_start", "w_end",
        granularity_ms=30 * 60 * 1000,
    )
    return out.select("user_id", "purchase_id", "error_id")


Q_INTERVAL_JOIN_ORACLE = """
SELECT p.user_id, p.event_id AS purchase_id, e.event_id AS error_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND epoch_ms(p.ts::TIMESTAMP) BETWEEN epoch_ms(e.ts::TIMESTAMP)
                                   AND epoch_ms(e.ts::TIMESTAMP) + 1800000
"""


# -- skew-resistant salted aggregation ------------------------------------------------
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregate (operators/skew.py) over lineitem's 3 giant
    l_returnflag groups — the skewed-agg shape at 100 TB. l_quantity is
    integral-valued, so the salted re-ordering of the double sum is FP-exact and
    the result matches the single-stage oracle bit-for-bit."""
    from movie_genre_data_pipeline_spark.operators.skew import salted_agg

    li = load(spark, sf_dir, "lineitem")
    return salted_agg(li, ["l_returnflag"], "l_quantity", n_salts=16)


Q_SKEW_SALTED_AGG_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       SUM(l_quantity) AS total,
       MIN(l_quantity) AS minimum,
       MAX(l_quantity) AS maximum,
       SUM(l_quantity) / COUNT(*) AS mean
FROM lineitem GROUP BY l_returnflag
"""


# -- skew-resistant salted join -------------------------------------------------------
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join (operators/skew.salted_join): lineitem fans out over
    8 salt sub-partitions per supplier key, supplier replicated once per salt —
    the static-plan skew fix for where AQE can't act (streaming joins, first
    shuffles, pinned plans). Result is salt-invariant; revenue rounded per the
    suite's float discipline. (At suite scale Catalyst may still broadcast the
    replicated dim — the salting is a no-op then, which is exactly the
    graceful-degradation property we want.)"""
    from movie_genre_data_pipeline_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    j = salted_join(li, sup, on="l_suppkey", n_salts=8)
    return j.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


Q_SKEW_SALTED_JOIN_ORACLE = """
SELECT s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


# -- as-of join: most recent prior click per purchase, per user -----------------------
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): for every purchase event, the latest click
    by the same user at-or-before the purchase. Union+window plan — one shuffle
    on user_id, no range join. Oracle: DuckDB's native ASOF LEFT JOIN."""
    from movie_genre_data_pipeline_spark.operators.asof import asof_join
    from movie_genre_data_pipeline_spark.operators.timeseries import epoch_millis

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(purchases, clicks, "user_id", right_cols=["event_id"])
    return out.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("event_id_asof").alias("click_id"),
        (epoch_millis("ts") - epoch_millis("ts_asof")).alias("ms_since_click"),
    )


Q_ASOF_JOIN_ORACLE = """
SELECT l.user_id,
       l.event_id AS purchase_id,
       r.event_id AS click_id,
       epoch_ms(l.ts::TIMESTAMP) - epoch_ms(r.ts::TIMESTAMP) AS ms_since_click
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# -- SQL surface: catalog DDL + multi-table SQL (SURVEY.md §3 entry point 3, §2.2
# W6/W7). The reference registers path-backed tables in a `Movie` database and
# queries them with spark.sql; the OSS equivalents are a catalog database + temp
# views, exercised here end-to-end with one ANSI statement both engines run.
_SQL_SURFACE_STMT = """
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > 0
GROUP BY n.n_name
"""


def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql("CREATE DATABASE IF NOT EXISTS movie_pipeline")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_SQL_SURFACE_STMT)


Q_SQL_SURFACE_ORACLE = _SQL_SURFACE_STMT


# -- TPC-H Q3: shipping priority (3-way join + top-k) ---------------------------------
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered fact-fact-dim join → grouped revenue → deterministic top-10.
    Filters sit directly on each scan (pushed to parquet); the two big tables
    shuffle on the join key and AQE picks the strategy. Ordering is on the
    ROUNDED revenue with a key tiebreak so the top-10 cutoff is engine-stable."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


Q_TPCH_Q3_ORACLE = """
SELECT o_orderkey,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
       o_orderdate
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# -- TPC-H Q5: local supplier volume (6-way join w/ extra equality) -------------------
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join with the classic "customer and supplier in the same nation"
    cross-constraint. nation/region are broadcast (constant-size dims); the
    fact-side joins shuffle on their keys. The n_nationkey == s_nationkey
    predicate rides the supplier join, so no extra shuffle stage."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q_TPCH_Q5_ORACLE = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# -- TPC-H Q6: pure filter + global aggregate (pushdown showcase) ---------------------
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-table scan-filter-agg: every predicate reaches the parquet reader
    (PushedFilters in the plan) and the aggregate is a two-phase partial/final
    with no other shuffle — the minimal-IO shape at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q_TPCH_Q6_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# -- TPC-H Q17-style: correlated scalar subquery (decorrelated to agg+join) -----------
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Lines well below the part's average quantity' — the correlated scalar
    subquery decorrelated the way Catalyst would: one per-part aggregate, then a
    same-key join back to the fact (one shuffle each side, co-partitioned). The
    threshold is rounded to 6dp on BOTH engines before comparing so avg()
    accumulation-order noise can't flip a borderline row."""
    part_keys = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        part_keys, F.col("l_partkey") == F.col("p_partkey")
    )
    thresholds = li.groupBy("l_partkey").agg(
        F.round(F.lit(0.5) * F.avg("l_quantity"), 6).alias("qty_threshold")
    )
    return (
        li.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q_TPCH_Q17_ORACLE = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
      SELECT ROUND(0.5 * AVG(l2.l_quantity), 6)
      FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


# -- TPC-H Q18-style: group-having then join back (large-volume orders) ---------------
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total line quantity exceeds 200: aggregate-then-filter
    (HAVING) on the fact, then join the survivors back to orders/customer. The
    having-filtered side is tiny relative to the fact, so AQE broadcasts it into
    the join at runtime. l_quantity is integral-valued → the sum is FP-exact."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
    )


Q_TPCH_Q18_ORACLE = """
SELECT c_name, o_orderkey, o_orderdate,
       ROUND(o_totalprice, 2) AS totalprice, sum_qty
FROM (
    SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY l_orderkey HAVING ROUND(SUM(l_quantity), 2) > 200
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


QUERIES: dict[str, QuerySpec] = {
    "asof_join": QuerySpec(q_asof_join, Q_ASOF_JOIN_ORACLE),
    "tpch_q3": QuerySpec(q_tpch_q3, Q_TPCH_Q3_ORACLE),
    "tpch_q5": QuerySpec(q_tpch_q5, Q_TPCH_Q5_ORACLE),
    "tpch_q6": QuerySpec(q_tpch_q6, Q_TPCH_Q6_ORACLE),
    "tpch_q17": QuerySpec(q_tpch_q17, Q_TPCH_Q17_ORACLE),
    "tpch_q18": QuerySpec(q_tpch_q18, Q_TPCH_Q18_ORACLE),
    "skew_salted_agg": QuerySpec(q_skew_salted_agg, Q_SKEW_SALTED_AGG_ORACLE),
    "skew_salted_join": QuerySpec(q_skew_salted_join, Q_SKEW_SALTED_JOIN_ORACLE),
    "interval_join": QuerySpec(q_interval_join, Q_INTERVAL_JOIN_ORACLE),
    "sketch_approx_stats": QuerySpec(q_sketch_approx_stats, Q_SKETCH_APPROX_STATS_ORACLE),
    "grouped_pandas_norm": QuerySpec(q_grouped_pandas_norm, Q_GROUPED_PANDAS_NORM_ORACLE),
    "profile_percentiles": QuerySpec(q_profile_percentiles, Q_PROFILE_PERCENTILES_ORACLE),
    "window_rank_suite": QuerySpec(q_window_rank_suite, Q_WINDOW_RANK_SUITE_ORACLE),
    "scalar_functions": QuerySpec(q_scalar_functions, Q_SCALAR_FUNCTIONS_ORACLE),
    "array_functions": QuerySpec(q_array_functions, Q_ARRAY_FUNCTIONS_ORACLE),
    "null_handling": QuerySpec(q_null_handling, Q_NULL_HANDLING_ORACLE),
    "sql_surface": QuerySpec(q_sql_surface, Q_SQL_SURFACE_ORACLE),
    "tpch_q1": QuerySpec(q_tpch_q1, Q_TPCH_Q1_ORACLE),
    "star_join": QuerySpec(q_star_join, Q_STAR_JOIN_ORACLE),
    "semi_join": QuerySpec(q_semi_join, Q_SEMI_JOIN_ORACLE),
    "topk_orders": QuerySpec(q_topk_orders, Q_TOPK_ORDERS_ORACLE),
    "window_topk_per_group": QuerySpec(q_window_topk_per_group, Q_WINDOW_TOPK_ORACLE),
    "window_running_sum": QuerySpec(q_window_running_sum, Q_WINDOW_RUNNING_SUM_ORACLE),
    "window_lag_delta": QuerySpec(q_window_lag_delta, Q_WINDOW_LAG_DELTA_ORACLE),
    "pivot": QuerySpec(q_pivot, Q_PIVOT_ORACLE),
    "rollup": QuerySpec(q_rollup, Q_ROLLUP_ORACLE),
    "cube": QuerySpec(q_cube, Q_CUBE_ORACLE),
    "set_ops": QuerySpec(q_set_ops, Q_SET_OPS_ORACLE),
    "intersect": QuerySpec(q_intersect, Q_INTERSECT_ORACLE),
    "count_distinct": QuerySpec(q_count_distinct, Q_COUNT_DISTINCT_ORACLE),
    "from_json_props": QuerySpec(q_from_json, Q_FROM_JSON_ORACLE),
    "sessionize": QuerySpec(q_sessionize, Q_SESSIONIZE_ORACLE),
    "tumbling_window": QuerySpec(q_tumbling_window, Q_TUMBLING_WINDOW_ORACLE),
    "sliding_window": QuerySpec(q_sliding_window, Q_SLIDING_WINDOW_ORACLE),
    "anti_join": QuerySpec(q_anti_join, Q_ANTI_JOIN_ORACLE),
    "pandas_scalar_udf": QuerySpec(q_pandas_scalar_udf, Q_PANDAS_SCALAR_UDF_ORACLE),
    "posexplode_tokens": QuerySpec(q_posexplode_tokens, Q_POSEXPLODE_TOKENS_ORACLE),
    "range_source": QuerySpec(q_range_source, Q_RANGE_SOURCE_ORACLE),
    "profile_table": QuerySpec(q_profile_table, Q_PROFILE_TABLE_ORACLE),
    "map_functions": QuerySpec(q_map_functions, Q_MAP_FUNCTIONS_ORACLE),
    "union_by_name": QuerySpec(q_union_by_name, Q_UNION_BY_NAME_ORACLE),
    "stats_aggregates": QuerySpec(q_stats_aggregates, Q_STATS_AGGREGATES_ORACLE),
}
