"""Structured Streaming queries over `events` (north star: watermarks + event-time
windows; absent from the reference, which only uses Trigger.Once file streams —
SURVEY.md §2.8).

Each query runs a REAL streaming job (file-source stream over the events parquet,
availableNow trigger, memory sink) to completion, then returns the sink as a batch
DataFrame — so the driver's oracle check covers actual streaming execution, not a
batch re-phrasing. The batch twins (relational.q_tumbling_window / q_sessionize)
share the same oracles' semantics.

The stream's declared `ts` type is FOOTER-DRIVEN (VERDICT r03 #2 — the fixture
drifted nanos→micros and a hardcoded nanos-as-long schema silently compressed
time 1000×): INT64-nanos files are declared LONG (with
spark.sql.legacy.parquet.nanosAsLong set) and converted `div 1000` in-stream —
the same truncation DuckDB applies; micros/millis/INT96 files are declared
TIMESTAMP directly (the declared schema overrides NTZ inference, and with the
session pinned UTC the values match the tz-naive oracle). This is the
reference's own infer-once/freeze pattern (Autoloader_notebook/
Raw_to_Bronze.py:21-23) applied per physical encoding.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from movie_genre_data_pipeline_spark.suite import QuerySpec

# Micro-batch split override for the ledger-fold family. The additive folds
# claim BATCH-SPLIT INDEPENDENCE (any partition of the feed into micro-batches
# yields the same final state); tests/test_stream_split_invariance.py sets
# this to 1/3/7 and asserts identical outputs — the direct gate the shared
# batch oracles only imply (VERDICT r7 #6). None = each query's default.
SOURCE_SPLIT: int | None = None


def _split(default: int) -> int:
    return SOURCE_SPLIT if SOURCE_SPLIT is not None else default



def _events_ts_is_nanos(sf_dir: str) -> bool:
    from movie_genre_data_pipeline_spark.sources.batch import _nanos_timestamp_columns

    return "ts" in _nanos_timestamp_columns(f"{sf_dir}/events.parquet")


def _events_stream_schema(nanos: bool) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType() if nanos else T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _open_event_stream(spark: SparkSession, sf_dir: str, link_dir: str) -> DataFrame:
    """File-source stream over `link_dir` with the footer-appropriate ts schema."""
    nanos = _events_ts_is_nanos(sf_dir)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # match tz-naive oracle
    # stateful streaming ops can't use AQE, and every shuffle partition carries
    # a state store whose per-batch open/commit cost dominates at suite scale
    # (measured: 32 partitions 1.5s vs 8 partitions 0.8s on the sf0.1 tumbling
    # window — state is only thousands of keys). Pin low here; a production
    # deployment sizes this to state volume / cluster cores instead (state
    # repartitioning requires a checkpoint reset, so pick it per workload).
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    stream = (
        spark.readStream.format("parquet")
        .schema(_events_stream_schema(nanos))
        .load(link_dir)
    )
    if nanos:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events.parquet is a single FILE; the streaming file source requires a
    # directory (its per-batch relation rejects file-valued basePaths). Expose it
    # through a temp directory containing a symlink — zero-copy, read-only-safe.
    link_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(f"{sf_dir}/events.parquet", f"{link_dir}/events.parquet")
    return _open_event_stream(spark, sf_dir, link_dir)


def _run_to_memory(df: DataFrame, output_mode: str) -> DataFrame:
    name = f"mem_{uuid.uuid4().hex[:10]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


# -- tumbling window (streaming, complete mode) -----------------------------------
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _event_stream(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        "event_type",
        "n",
        "total_value",
    )


Q_STREAM_TUMBLING_ORACLE = """
SELECT strftime(make_timestamp(CAST(FLOOR(EPOCH(ts) / 21600) * 21600 AS BIGINT) * 1000000),
                '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


# -- sliding windows (streaming) ------------------------------------------------------
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of relational.q_sliding_window: 6h windows every 3h, each
    event feeding two overlapping buckets. Streaming state is per-(window,type)
    partial aggregates — row duplication happens map-side before the shuffle,
    identical to the batch plan."""
    ev = _event_stream(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        "event_type",
        "n",
        "total_value",
    )


Q_STREAM_SLIDING_ORACLE = """
SELECT strftime(make_timestamp((CAST(FLOOR(EPOCH(ts) / 10800) AS BIGINT) - k) * 10800 * 1000000),
                '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events, UNNEST([0, 1]) AS t(k)
GROUP BY 1, 2
"""


# -- session windows (streaming) ------------------------------------------------------
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 30 min) per user — the streaming-native form of
    relational.q_sessionize (lag+cumsum). Same session definition; the oracle is
    the lag-based SQL."""
    ev = _event_stream(spark, sf_dir)
    sessions = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_ev"))
    out = _run_to_memory(sessions, "complete")
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_ev").alias("n_events"),
    )


Q_STREAM_SESSIONIZE_ORACLE = """
WITH gaps AS (
  SELECT user_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM gaps GROUP BY user_id
"""


# -- watermarked append-mode window (late-data semantics) -------------------------------
def q_stream_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark + append mode: only windows the watermark has passed are
    emitted; the trailing window(s) stay open. Over a BOUNDED fixture under
    availableNow the emitted set IS deterministic (VERDICT r05 #5): whatever
    the micro-batch split, the union of emissions is exactly the windows whose
    end <= final watermark = max(ts) truncated to ms, minus the 10-minute
    delay (Spark tracks event-time stats in milliseconds and runs a no-data
    batch after the last file batch to flush finalized windows). The oracle
    replays that predicate in SQL. Boundary note: window_end == watermark is
    emitted (verified empirically; both fixtures also sit >1h from any
    window-edge coincidence, so the strictness of the comparison cannot flip
    the result set)."""
    ev = _event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = _run_to_memory(agg, "append")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        "event_type",
        "n",
    )


# Final watermark in micros, ms-truncated like Spark's event-time stats; a
# 6h window is emitted in append mode iff its end <= that watermark.
Q_STREAM_WATERMARKED_ORACLE = """
WITH mx AS (
  SELECT (epoch_us(MAX(ts)) // 1000 - 600000) * 1000 AS wm_us FROM events
),
b AS (
  SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS w_start_us, event_type
  FROM events
)
SELECT strftime(make_timestamp(w_start_us), '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b, mx
WHERE w_start_us + 21600000000 <= mx.wm_us
GROUP BY 1, 2
"""


# -- custom stateful operator (applyInPandasWithState) -------------------------------
def q_stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running stats via an arbitrary-stateful operator
    (`applyInPandasWithState`): state = (n_events, max_value) per user, updated
    per micro-batch with Arrow-batched pandas. The emitted running values depend
    on micro-batch boundaries, but the FINAL per-user row (max over emissions)
    is batch-deterministic — count and max are accumulation-order-free — so the
    result is oracle-checkable even though the operator itself has no SQL form."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = _event_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, mx = state.get
        else:
            n, mx = 0, None
        for pdf in pdfs:
            vals = pdf["value"].dropna()
            n += int(len(pdf))
            if len(vals):
                m = float(vals.max())
                mx = m if mx is None else max(mx, m)
        state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, max_value double",
        stateStructType="n_events long, max_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    mem = _run_to_memory(out, "update")
    return mem.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_value").alias("max_value"),
    )


Q_STREAM_STATEFUL_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(value) AS max_value
FROM events GROUP BY user_id
"""


# -- streaming dedup (dropDuplicatesWithinWatermark) -----------------------------------
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the same events file is delivered TWICE
    (double symlink — simulating at-least-once redelivery), and
    `dropDuplicatesWithinWatermark` on event_id collapses the duplicates with
    state bounded by the watermark (the 100 TB requirement: dedup state must
    expire, not grow forever). Oracle: each event counted exactly once."""
    link_dir = tempfile.mkdtemp(prefix="events_dup_stream_")
    os.symlink(f"{sf_dir}/events.parquet", f"{link_dir}/events_copy1.parquet")
    os.symlink(f"{sf_dir}/events.parquet", f"{link_dir}/events_copy2.parquet")
    stream = _open_event_stream(spark, sf_dir, link_dir)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = _run_to_memory(deduped, "append")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_id").alias("n_distinct"),
    )


Q_STREAM_DEDUP_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
"""


# -- stream-stream join (watermarked, time-range condition) ---------------------------
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase joined to clicks by
    the same user within the preceding 30 minutes. Both sides carry watermarks
    so Spark can bound the join state (the 100 TB requirement — unbounded
    stream-stream joins otherwise keep every row forever). With availableNow
    over a finite input the emitted matches are exactly the batch answer, so
    the time-range-join SQL is the oracle."""
    purchases = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    out = _run_to_memory(joined, "append")
    return out.select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id"
    )


Q_STREAM_STREAM_JOIN_ORACLE = """
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND epoch_ms(c.ts::TIMESTAMP) BETWEEN epoch_ms(p.ts::TIMESTAMP) - 1800000
                                   AND epoch_ms(p.ts::TIMESTAMP)
"""


# -- stream ⋈ static dimension (broadcast enrich) -------------------------------------
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join — THE streaming-enrichment pattern: an unbounded event
    stream joined to a bounded dimension table. The static side is broadcast
    (no state store, no watermark needed on the dim; Spark re-plans the static
    side per micro-batch), then windowed-aggregated per market segment."""
    from movie_genre_data_pipeline_spark.suite import load

    ev = _event_stream(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "inner")
    agg = joined.groupBy(F.window("ts", "12 hours").alias("w"), "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        "c_mktsegment",
        "n",
        "total_value",
    )


Q_STREAM_STATIC_JOIN_ORACLE = """
SELECT strftime(make_timestamp(CAST(FLOOR(EPOCH(ts) / 43200) * 43200 AS BIGINT) * 1000000),
                '%Y-%m-%d %H:%M:%S') AS w_start,
       c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


# -- foreachBatch + join-based upsert (W5: the OSS Delta-MERGE stream) ----------------
def q_stream_foreachbatch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `foreachBatch(upsertToDelta)` stream
    (Autoloader_notebook/Bronze_to_Silver.py:257-276) rebuilt over Parquet: a
    file-source stream of customers feeds per-micro-batch join-based upserts
    into a materialized target table (negative-balance customers flip status
    new→flagged). Ping-pong target dirs keep each batch's read/write disjoint;
    the final table is returned and oracle-checked — streaming execution, exact
    batch-SQL answer."""
    from movie_genre_data_pipeline_spark.operators.upsert import upsert_update
    from movie_genre_data_pipeline_spark.suite import load

    base = tempfile.mkdtemp(prefix="febatch_merge_")
    target0 = f"{base}/t0"
    cust = load(spark, sf_dir, "customer")
    cust.select("c_custkey").withColumn("status", F.lit("new")).write.parquet(target0)

    link_dir = f"{base}/stream_src"
    os.mkdir(link_dir)
    os.symlink(f"{sf_dir}/customer.parquet", f"{link_dir}/customer.parquet")
    schema = spark.read.parquet(f"{sf_dir}/customer.parquet").schema
    stream = spark.readStream.format("parquet").schema(schema).load(link_dir)
    updates = (
        stream.filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
        .withColumn("new_status", F.lit("flagged"))
    )

    state = {"cur": target0}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        tgt = spark.read.parquet(state["cur"])
        nxt = f"{base}/t{batch_id + 1}"
        upsert_update(tgt, batch_df, "c_custkey", {"status": "new_status"}).write.parquet(nxt)
        state["cur"] = nxt

    q = (
        updates.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(state["cur"])


Q_STREAM_FOREACHBATCH_MERGE_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'flagged' ELSE 'new' END AS status
FROM customer
"""


def q_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingestion with cross-batch dedup: a file-source stream of
    documents feeds foreachBatch(incremental_dedup) against an accumulating
    fingerprint LEDGER — each micro-batch drops docs whose normalized fingerprint
    is already in the ledger (or duplicated within the batch) and appends only
    the fresh ones. The ledger is seeded with a historical corpus (doc_id % 4
    != 0), and the stream replays ALL documents — so every historical doc is
    dropped as already-seen and only genuinely new content lands. This is the
    streaming twin of `dedup_incremental`; the final ledger is returned and
    oracle-checked, so the correctness gate covers real streaming execution.

    Scale: the per-batch work is the `incremental_dedup` anti-join keyed on the
    128-bit fingerprint; the ledger grows append-only (the same status-ledger
    pattern as streaming/incremental.py, never rewritten)."""
    from movie_genre_data_pipeline_spark.functions.dedup import incremental_dedup
    from movie_genre_data_pipeline_spark.functions.text import fingerprint
    from movie_genre_data_pipeline_spark.suite import load

    base = tempfile.mkdtemp(prefix="stream_inc_dedup_")
    ledger = f"{base}/ledger"
    docs = load(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 4 != 0).select(
        "doc_id", "lang", fingerprint("text").alias("fp")
    ).write.parquet(ledger)

    link_dir = f"{base}/stream_src"
    os.mkdir(link_dir)
    os.symlink(f"{sf_dir}/documents.parquet", f"{link_dir}/documents.parquet")
    schema = docs.schema
    stream = spark.readStream.format("parquet").schema(schema).load(link_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        history = spark.read.parquet(ledger)
        fresh = incremental_dedup(
            batch_df, history, "doc_id", "text", history_fp_col="fp"
        )
        fresh.select("doc_id", "lang", "fp").write.mode("append").parquet(ledger)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(ledger)


# history rows ∪ the fresh keepers (same derivation as Q_DEDUP_INCREMENTAL_ORACLE:
# batch docs not fingerprint-matched in history, lowest doc_id per batch fp).
Q_STREAM_INCREMENTAL_DEDUP_ORACLE = """
WITH fps AS (
  SELECT doc_id, lang,
         md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f\v]+', ' ', 'g')) AS fp
  FROM documents
),
fresh AS (
  SELECT b.* FROM (SELECT * FROM fps WHERE doc_id % 4 = 0) b
  WHERE NOT EXISTS (SELECT 1 FROM fps h
                    WHERE h.doc_id % 4 != 0 AND h.fp = b.fp)
)
SELECT doc_id, lang, fp FROM fps WHERE doc_id % 4 != 0
UNION ALL
SELECT doc_id, lang, fp FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fresh)
WHERE rn = 1
"""


def q_stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-count at sketch size: four real micro-batches
    (maxFilesPerTrigger=1 over a 4-file copy of events) each append their HLL
    register table to a ledger; the final union + re-max + estimate EXACTLY
    equals the batch sketch — the mergeability contract from functions/hll.py
    under genuine incremental execution, so this shares the batch HLL oracle
    verbatim. The ledger is the production shape: per-batch register
    deltas land append-only (at most groups × 2^p rows per batch, independent
    of batch row count), and any reader folds them on demand — continuous
    cardinality monitoring without any stateful-streaming state store."""
    from movie_genre_data_pipeline_spark.functions.hll import (
        hll_estimate,
        hll_registers,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sketch_queries import HLL_P

    base = tempfile.mkdtemp(prefix="stream_hll_")
    src, ledger = f"{base}/src", f"{base}/ledger"
    ev = load(spark, sf_dir, "events")
    ev.select("event_type", "user_id").repartition(4).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        hll_registers(batch_df, "user_id", ["event_type"], p=HLL_P).write.mode(
            "append"
        ).parquet(ledger)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(ledger)
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    est = hll_estimate(folded, ["event_type"], p=HLL_P)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        "n_zero",
        "register_sum",
        "hll_est",
        F.round(
            (F.col("hll_est") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
    )


def _stream_hll_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sketch_queries import _hll_oracle

    return _hll_oracle()


STREAM_KMV_K = 128


def q_stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second instance of the streaming sketch-ledger pattern (after
    `stream_hll_distinct`): four real micro-batches each append their KMV
    bottom-k sketch of (event_type, user_id) to a ledger; the fold on read
    (distinct ∪ re-bottom-k) EXACTLY equals the batch sketch — every one of
    the global k smallest hashes appears in some batch and is necessarily in
    that batch's bottom-k, so merge loses nothing. Proves mergeability under
    incremental execution is a family property of the sketches
    (functions/{hll,kmv}.py), not an HLL one-off. Ledger state is ≤ groups·k
    rows per batch, independent of batch row count — no state store."""
    from movie_genre_data_pipeline_spark.functions.kmv import HASH_SPACE, kmv_sketch
    from movie_genre_data_pipeline_spark.suite import load

    base = tempfile.mkdtemp(prefix="stream_kmv_")
    src, ledger = f"{base}/src", f"{base}/ledger"
    ev = load(spark, sf_dir, "events")
    ev.select("event_type", "user_id").repartition(4).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        kmv_sketch(batch_df, "user_id", ["event_type"], k=STREAM_KMV_K).write.mode(
            "append"
        ).parquet(ledger)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.col("h48").asc())
    folded = (
        spark.read.parquet(ledger)
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= STREAM_KMV_K)
        .drop("__rn")
    )
    agg = folded.groupBy("event_type").agg(
        F.max("h48").alias("h_k"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )
    est = F.when(
        F.col("n_kept") < STREAM_KMV_K, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(STREAM_KMV_K - 1) * HASH_SPACE) / F.col("h_k"))
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact")
    )
    return (
        agg.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            "n_kept",
            "h_k",
            F.round(est, 2).alias("kmv_est"),
            F.round((est - F.col("n_exact")) / F.col("n_exact"), 4).alias("rel_err"),
        )
    )


def _stream_kmv_oracle() -> str:
    k = STREAM_KMV_K
    union_num = float(k - 1) * float(1 << 48)
    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 12))
           AS BIGINT) AS h48
  FROM events
),
sk AS (
  SELECT event_type, h48 FROM (
    SELECT event_type, h48,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h48 ASC) AS rn
    FROM hashed) t
  WHERE rn <= {k}
),
agg AS (
  SELECT event_type, MAX(h48) AS h_k, CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM sk GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
),
est AS (
  SELECT event_type, h_k, n_kept,
         CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
              ELSE {union_num!r} / h_k END AS e
  FROM agg
)
SELECT x.event_type, x.n_exact, a.n_kept, a.h_k,
       ROUND(a.e, 2) AS kmv_est,
       ROUND((a.e - x.n_exact) / x.n_exact, 4) AS rel_err
FROM est a JOIN exact x USING (event_type)
"""


def q_stream_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third instance of the streaming sketch-ledger pattern (after
    `stream_hll_distinct` / `stream_kmv_distinct`), covering the last sketch
    family member with additive merge: four real micro-batches each append
    their 200-bin counting histogram of `value` to a ledger; the fold on read
    is cell-wise re-SUM (integer addition — exact, order-free), so the folded
    histogram EXACTLY equals the batch build and the quantile interpolation
    shares the batch oracle verbatim. Ledger state is ≤ groups × bins rows per
    batch, independent of batch row count — continuous latency/size
    percentile monitoring with no state store."""
    from movie_genre_data_pipeline_spark.functions.quantiles import (
        build_histogram,
        histogram_quantiles,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sketch_queries import (
        HISTO_BINS,
        HISTO_HI,
        HISTO_LO,
        HISTO_QS,
    )

    base = tempfile.mkdtemp(prefix="stream_histo_")
    src, ledger = f"{base}/src", f"{base}/ledger"
    ev = load(spark, sf_dir, "events")
    ev.select("event_type", "value").repartition(4).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        build_histogram(
            batch_df, "value", HISTO_LO, HISTO_HI, HISTO_BINS, ["event_type"]
        ).write.mode("append").parquet(ledger)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(ledger)
        .groupBy("event_type", "bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    est = histogram_quantiles(
        folded, HISTO_QS, HISTO_LO, HISTO_HI, HISTO_BINS, ["event_type"]
    )
    exact = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_exact"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99_exact"),
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n",
        "hq50",
        "hq90",
        "hq99",
        "p50_exact",
        "p99_exact",
        F.round(F.col("hq50") - F.col("p50_exact"), 6).alias("err50"),
        F.round(F.col("hq99") - F.col("p99_exact"), 6).alias("err99"),
    )


def _stream_histo_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sketch_queries import (
        Q_HISTOGRAM_QUANTILES_ORACLE,
    )

    return Q_HISTOGRAM_QUANTILES_ORACLE


def q_stream_cms_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth streaming sketch ledger — Count-Min under incremental execution:
    four real micro-batches of documents each shingle their own text and
    append their d×w grid delta to a ledger; the fold on read is cell-wise
    re-SUM (like the histogram — CMS is a linear sketch), so the folded grid
    EXACTLY equals the batch build and the heavy-hitter probe shares the batch
    oracle verbatim. EVERY sketch family member now has an incremental path
    proven under its own merge algebra (max / bottom-k / sum / sum). Ledger
    state ≤ d·w rows per batch regardless of batch size."""
    from movie_genre_data_pipeline_spark.functions.cms import build_cms, cms_estimate
    from movie_genre_data_pipeline_spark.functions.dedup import shingle_rows
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sketch_queries import (
        CMS_D,
        CMS_W,
        GRAM_K,
        TOP_N,
    )

    base = tempfile.mkdtemp(prefix="stream_cms_")
    src, ledger = f"{base}/src", f"{base}/ledger"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(4).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        grams = shingle_rows(batch_df, "doc_id", "text", k=GRAM_K).select(
            F.col("s").alias("gram")
        )
        build_cms(grams, "gram", CMS_W, CMS_D).write.mode("append").parquet(ledger)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(ledger)
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .localCheckpoint()
    )
    grams = shingle_rows(d, "doc_id", "text", k=GRAM_K).select(
        F.col("s").alias("gram")
    )
    vocab = grams.groupBy("gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    est = cms_estimate(vocab, "gram", folded, CMS_W, CMS_D)
    return (
        est.select(
            "gram",
            "n_exact",
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") - F.col("n_exact")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.col("cms_est").desc(), F.col("gram").asc())
        .limit(TOP_N)
    )


def _stream_cms_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sketch_queries import (
        Q_CMS_HEAVY_HITTERS_ORACLE,
    )

    return Q_CMS_HEAVY_HITTERS_ORACLE


def q_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dimension maintenance: the customer-tier SCD2 history kept
    current by foreachBatch + scd2_apply_incremental_log — each micro-batch
    appends to the version-event LOG (the bitemporal source of truth), then
    rebuilds ONLY its touched keys from their full log against the persisted
    history (versioned parquet generations, read-previous/write-next, the
    no-Delta equivalent of MERGE's snapshot isolation). Micro-batches here
    arrive in ARBITRARY date order (round-robin file split), which is
    exactly the case where collapsed-history incrementality loses no-op
    restore points — the log-based rebuild is order-independent, so the
    final history EXACTLY equals the batch derivation and this query shares
    merge_scd2's oracle verbatim."""
    from movie_genre_data_pipeline_spark.operators.scd import (
        scd2_apply,
        scd2_apply_incremental_log,
    )
    from movie_genre_data_pipeline_spark.suite import load

    base_dir = tempfile.mkdtemp(prefix="stream_scd2_")
    src = f"{base_dir}/src"
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    ups = (
        orders.filter(F.col("o_totalprice") > 350000)
        .groupBy(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderdate").alias("eff_from"),
        )
        .agg(F.max("o_totalprice").alias("amt"))
        .select(
            "c_custkey",
            "eff_from",
            F.when(F.col("amt") > 450000, "PLATINUM")
            .when(F.col("amt") > 400000, "GOLD")
            .otherwise("SILVER")
            .alias("tier"),
        )
    )
    ups.repartition(4).write.parquet(src)

    base = cust.select(
        "c_custkey",
        F.lit("1990-01-01").cast("timestamp").alias("eff_from"),
        F.lit("BASE").alias("tier"),
    )
    # generation 0: every customer's BASE version; the log seeds with the
    # same BASE rows (each key's first version event)
    gen = {"n": 0}
    log_dir = f"{base_dir}/log"
    base.write.parquet(log_dir)
    scd2_apply(base, base.limit(0), ["c_custkey"], ["tier"], "eff_from").write.parquet(
        f"{base_dir}/hist_0"
    )

    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("eff_from", T.TimestampType()),
            T.StructField("tier", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # 1. the event log is the source of truth — append first
        batch_df.select("c_custkey", "eff_from", "tier").write.mode(
            "append"
        ).parquet(log_dir)
        # 2. rebuild touched keys from their full log; untouched pass through
        prev = spark.read.parquet(f"{base_dir}/hist_{gen['n']}")
        log = spark.read.parquet(log_dir)
        nxt = scd2_apply_incremental_log(
            prev, log, batch_df, ["c_custkey"], ["tier"], "eff_from"
        )
        gen["n"] += 1
        nxt.write.parquet(f"{base_dir}/hist_{gen['n']}")
        # reclaim superseded history generations (no-Delta VACUUM, keep=2)
        from movie_genre_data_pipeline_spark.fsutil import vacuum_generations

        vacuum_generations(base_dir, "hist", keep=2)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    hist = spark.read.parquet(f"{base_dir}/hist_{gen['n']}")
    return hist.select("c_custkey", "tier", "eff_from", "eff_to", "is_current")


def q_stream_gold_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gold refresh: the CDC change feed arrives as micro-batches
    (round-robin file split, so change order is arbitrary) and foreachBatch
    folds each batch's signed contributions into the persisted additive mart
    state (versioned parquet generations — the no-Delta equivalent of MERGE
    snapshot isolation). Delta application is ADDITIVE over integral state,
    so the fold is batch-split- and order-independent and the final mart
    equals the batch rebuild bit-for-bit — this query shares
    gold_genre_revenue_ivm's oracle verbatim. The 100 TB shape: continuous
    gold maintenance priced per-batch at |changes| + |genres| rows."""
    from movie_genre_data_pipeline_spark.operators.cdc import snapshot_diff
    from movie_genre_data_pipeline_spark.plans.gold import (
        apply_genre_revenue_delta,
        build_genre_revenue_state,
        finalize_genre_revenue,
    )
    from movie_genre_data_pipeline_spark.suite.pipeline_queries import (
        gold_ivm_frames,
    )

    base_dir = tempfile.mkdtemp(prefix="stream_gold_ivm_")
    src = f"{base_dir}/src"
    snap_a, snap_b, genre_dim = gold_ivm_frames(spark, sf_dir)
    changes = snapshot_diff(
        snap_a, snap_b, ["Id"], ["Revenue", "Budget", "RunTime", "Genres_Id"]
    ).filter(F.col("change_type") != "unchanged")
    changes.repartition(3).write.parquet(src)
    change_schema = spark.read.parquet(src).schema

    gen = {"n": 0}
    build_genre_revenue_state(snap_a, genre_dim).write.parquet(
        f"{base_dir}/state_0"
    )
    dim = genre_dim.localCheckpoint(eager=True)  # reused every micro-batch

    stream = (
        spark.readStream.format("parquet")
        .schema(change_schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from movie_genre_data_pipeline_spark.fsutil import vacuum_generations

        prev = spark.read.parquet(f"{base_dir}/state_{gen['n']}")
        nxt = apply_genre_revenue_delta(prev, batch_df, dim)
        gen["n"] += 1
        nxt.write.parquet(f"{base_dir}/state_{gen['n']}")
        # reclaim superseded generations; keep=2 preserves read-prev/write-next
        vacuum_generations(base_dir, "state", keep=2)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    state = spark.read.parquet(f"{base_dir}/state_{gen['n']}")
    return finalize_genre_revenue(state)


def q_stream_dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor: the NEW snapshot arrives as micro-batches and
    each batch folds its per-bin counts into a persisted bin ledger (counts
    are additive — the same mergeability argument as the sketch ledgers).
    When the stream drains, the report compares the folded new-side histogram
    against the static reference snapshot — and equals the batch drift report
    bit-for-bit, sharing dq_drift_report's oracle verbatim. The production
    shape: continuous distribution monitoring priced per batch at one
    n_bins-key aggregate."""
    from movie_genre_data_pipeline_spark.operators.quality import (
        bin_counts,
        drift_from_counts,
    )
    from movie_genre_data_pipeline_spark.suite.pipeline_queries import (
        gold_ivm_frames,
    )

    base_dir = tempfile.mkdtemp(prefix="stream_dq_drift_")
    src = f"{base_dir}/src"
    counts_dir = f"{base_dir}/bin_counts"
    snap_a, snap_b, _ = gold_ivm_frames(spark, sf_dir)
    snap_b.select("Revenue").repartition(3).write.parquet(src)

    LO, WIDTH, NBINS = 0.0, 50_000.0, 12
    stream = (
        spark.readStream.format("parquet")
        .schema("Revenue double")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        bin_counts(batch_df, "Revenue", LO, WIDTH, NBINS, "n").write.mode(
            "append"
        ).parquet(counts_dir)

    q = stream.writeStream.foreachBatch(fold_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    # fold = per-bin re-sum of the appended deltas; the report core consumes
    # the folded count ledger directly — counts are additive, so stream ==
    # batch by construction (no row reconstruction, ledger stays n_bins-sized)
    folded = (
        spark.read.parquet(counts_dir)
        .groupBy("bin_idx")
        .agg(F.sum("n").alias("n_new"))
    )
    return drift_from_counts(
        bin_counts(snap_a, "Revenue", LO, WIDTH, NBINS, "n_old"), folded
    )


def q_stream_ops_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming provenance: the dataset fingerprint maintained per
    micro-batch — each batch contributes (batch_rows, batch_hash mod p) to a
    ledger, and the fold is modular addition, so the final identity equals
    the one-shot batch fingerprint regardless of batch split (shares
    ops_dataset_fingerprint's oracle verbatim). The shape for continuously
    ingested corpora: the fingerprint is always current, never recomputed
    over history."""
    from movie_genre_data_pipeline_spark.operators.observe import (
        dataset_fingerprint,
    )

    P = 2_147_483_647
    base_dir = tempfile.mkdtemp(prefix="stream_fp_")
    src = f"{base_dir}/src"
    ledger = f"{base_dir}/ledger"
    from movie_genre_data_pipeline_spark.suite import load

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("k1"),
        F.col("l_linenumber").cast("string").alias("k2"),
        F.col("l_suppkey").cast("string").alias("k3"),
    )
    li.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.format("parquet")
        .schema("k1 string, k2 string, k3 string")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        dataset_fingerprint(batch_df, ["k1", "k2", "k3"]).write.mode(
            "append"
        ).parquet(ledger)

    q = stream.writeStream.foreachBatch(fold_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    return (
        spark.read.parquet(ledger)
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            (F.sum("content_hash") % P).cast("bigint").alias("content_hash"),
        )
    )


def _stream_fp_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.pipeline_queries import (
        Q_OPS_DATASET_FINGERPRINT_ORACLE,
    )

    return Q_OPS_DATASET_FINGERPRINT_ORACLE


def _stream_dq_drift_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.pipeline_queries import (
        Q_DQ_DRIFT_REPORT_ORACLE,
    )

    return Q_DQ_DRIFT_REPORT_ORACLE


def _stream_gold_ivm_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.pipeline_queries import (
        Q_GOLD_GENRE_REVENUE_IVM_ORACLE,
    )

    return Q_GOLD_GENRE_REVENUE_IVM_ORACLE


def q_stream_cdc_join_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous JOIN-view maintenance: the two-sided change feed
    (fact upserts / fact deletes / dim updates in ONE typed stream, split
    across micro-batches in arbitrary order) folds through
    operators/cdc.py:maintain_join_view per batch, with the dimension state
    folded first so later fact deltas re-derive against the dim as-of their
    batch. Each change key occurs once in the feed, so the fold is
    batch-split-independent: a fact row reinserted in batch i still receives
    batch j>i's dim update via the survivors path, and a dim update landing
    first is already in the dim state when its fact row reinserts. The final
    view equals the one-shot batch maintenance row-for-row — this query
    shares cdc_join_ivm's from-scratch rebuild oracle verbatim. 100 TB shape:
    per-batch cost is broadcast-delta-sized against the view, never a fact
    rescan."""
    from movie_genre_data_pipeline_spark.fsutil import vacuum_generations
    from movie_genre_data_pipeline_spark.operators.cdc import maintain_join_view
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.cdc_queries import (
        JV_DELETE_MOD,
        JV_MOVE_MOD,
        JV_REPRICE_MOD,
    )

    base_dir = tempfile.mkdtemp(prefix="stream_cdc_join_ivm_")
    src = f"{base_dir}/src"
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    facts = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
    )
    dim = customer.select("c_custkey", "c_mktsegment")
    view0 = facts.join(dim, "c_custkey").select(
        "o_orderkey", "c_custkey", "price_cents", "c_mktsegment"
    )
    ups = (
        facts.filter(
            (F.col("o_orderkey") % JV_REPRICE_MOD == 0)
            & (F.col("o_orderkey") % JV_DELETE_MOD != 0)
        )
        .withColumn("price_cents", F.col("price_cents") * 2)
        .select(
            F.lit("fact_upsert").alias("kind"),
            "o_orderkey",
            "c_custkey",
            "price_cents",
            F.lit(None).cast("string").alias("c_mktsegment"),
        )
    )
    dels = facts.filter(F.col("o_orderkey") % JV_DELETE_MOD == 0).select(
        F.lit("fact_delete").alias("kind"),
        "o_orderkey",
        F.lit(None).cast("bigint").alias("c_custkey"),
        F.lit(None).cast("bigint").alias("price_cents"),
        F.lit(None).cast("string").alias("c_mktsegment"),
    )
    dimu = dim.filter(F.col("c_custkey") % JV_MOVE_MOD == 0).select(
        F.lit("dim_update").alias("kind"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        "c_custkey",
        F.lit(None).cast("bigint").alias("price_cents"),
        F.lit("REASSIGNED").alias("c_mktsegment"),
    )
    ups.unionByName(dels).unionByName(dimu).repartition(_split(3)).write.parquet(src)
    feed_schema = spark.read.parquet(src).schema

    gen = {"n": 0}
    view0.write.parquet(f"{base_dir}/view_0")
    dim.write.parquet(f"{base_dir}/dim_0")

    stream = (
        spark.readStream.format("parquet")
        .schema(feed_schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        prev_view = spark.read.parquet(f"{base_dir}/view_{gen['n']}")
        prev_dim = spark.read.parquet(f"{base_dir}/dim_{gen['n']}")
        b_ups = batch_df.filter(F.col("kind") == "fact_upsert").select(
            "o_orderkey", "c_custkey", "price_cents"
        )
        b_dels = batch_df.filter(F.col("kind") == "fact_delete").select(
            "o_orderkey"
        )
        b_dimu = batch_df.filter(F.col("kind") == "dim_update").select(
            "c_custkey", "c_mktsegment"
        )
        nxt_view = maintain_join_view(
            prev_view, "o_orderkey", "c_custkey", b_ups, b_dels, prev_dim, b_dimu
        )
        renamed = b_dimu.select(
            "c_custkey", F.col("c_mktsegment").alias("__new_seg")
        )
        nxt_dim = prev_dim.join(F.broadcast(renamed), "c_custkey", "left").select(
            "c_custkey",
            F.coalesce(F.col("__new_seg"), F.col("c_mktsegment")).alias(
                "c_mktsegment"
            ),
        )
        gen["n"] += 1
        nxt_view.write.parquet(f"{base_dir}/view_{gen['n']}")
        nxt_dim.write.parquet(f"{base_dir}/dim_{gen['n']}")
        vacuum_generations(base_dir, "view", keep=2)
        vacuum_generations(base_dir, "dim", keep=2)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(f"{base_dir}/view_{gen['n']}")


def _stream_cdc_join_ivm_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.cdc_queries import (
        Q_CDC_JOIN_IVM_ORACLE,
    )

    return Q_CDC_JOIN_IVM_ORACLE


def _stream_scd2_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.pipeline_queries import (
        Q_MERGE_SCD2_ORACLE,
    )

    return Q_MERGE_SCD2_ORACLE


QUERIES: dict[str, QuerySpec] = {
    "stream_tumbling_window": QuerySpec(q_stream_tumbling, Q_STREAM_TUMBLING_ORACLE),
    "stream_scd2_incremental": QuerySpec(q_stream_scd2, _stream_scd2_oracle()),
    "stream_gold_ivm": QuerySpec(q_stream_gold_ivm, _stream_gold_ivm_oracle()),
    "stream_cdc_join_ivm": QuerySpec(
        q_stream_cdc_join_ivm, _stream_cdc_join_ivm_oracle()
    ),
    "stream_dq_drift": QuerySpec(q_stream_dq_drift, _stream_dq_drift_oracle()),
    "stream_ops_fingerprint": QuerySpec(
        q_stream_ops_fingerprint, _stream_fp_oracle()
    ),
    "stream_cms_heavy": QuerySpec(q_stream_cms_heavy, _stream_cms_oracle()),
    "stream_histogram_quantiles": QuerySpec(
        q_stream_histogram_quantiles, _stream_histo_oracle()
    ),
    "stream_kmv_distinct": QuerySpec(q_stream_kmv_distinct, _stream_kmv_oracle()),
    "stream_hll_distinct": QuerySpec(q_stream_hll_distinct, _stream_hll_oracle()),
    "stream_sliding_window": QuerySpec(q_stream_sliding, Q_STREAM_SLIDING_ORACLE),
    "stream_sessionize": QuerySpec(q_stream_sessionize, Q_STREAM_SESSIONIZE_ORACLE),
    "stream_watermarked_append": QuerySpec(
        q_stream_watermarked, Q_STREAM_WATERMARKED_ORACLE
    ),
    "stream_stateful_user_stats": QuerySpec(
        q_stream_stateful_user_stats, Q_STREAM_STATEFUL_ORACLE
    ),
    "stream_static_join": QuerySpec(q_stream_static_join, Q_STREAM_STATIC_JOIN_ORACLE),
    "stream_foreachbatch_merge": QuerySpec(
        q_stream_foreachbatch_merge, Q_STREAM_FOREACHBATCH_MERGE_ORACLE
    ),
    "stream_incremental_dedup": QuerySpec(
        q_stream_incremental_dedup, Q_STREAM_INCREMENTAL_DEDUP_ORACLE
    ),
    "stream_stream_join": QuerySpec(q_stream_stream_join, Q_STREAM_STREAM_JOIN_ORACLE),
    "stream_dedup": QuerySpec(q_stream_dedup, Q_STREAM_DEDUP_ORACLE),
}


def q_stream_text_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous corpus profiling: four real micro-batches of documents each
    append their (source, term) count DELTAS to a ledger; the reader folds the
    ledger by re-sum (plain-count mergeability — the simplest member of the
    sketch-ledger family) and scores keyness over the folded counts. Additive
    merge makes the fold batch-split- and order-independent, so this shares
    the batch keyness oracle verbatim. Ledger state is vocabulary × sources
    per batch — independent of batch row count."""
    from movie_genre_data_pipeline_spark.functions.text import keyness_top_terms
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        KEYNESS_MIN_COUNT,
        KEYNESS_TOP_K,
        source_term_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_keyness_")
    src, ledger = f"{base}/src", f"{base}/ledger"
    docs = load(spark, sf_dir, "documents")
    docs.select("source", "text").repartition(4).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        source_term_counts(batch_df).write.mode("append").parquet(ledger)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(ledger)
        .groupBy("source", "term")
        .agg(F.sum("o").cast("bigint").alias("o"))
    )
    return keyness_top_terms(
        folded, top_k=KEYNESS_TOP_K, min_count=KEYNESS_MIN_COUNT
    )


def _stream_keyness_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_SOURCE_KEYNESS_ORACLE,
    )

    return Q_SOURCE_KEYNESS_ORACLE


QUERIES["stream_text_keyness"] = QuerySpec(
    q_stream_text_keyness, _stream_keyness_oracle()
)


def q_stream_mine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous market-basket mining. The subtlety: a basket's items can
    SPAN micro-batches, so per-batch pair generation would miss cross-batch
    pairs. The correct incremental state is the PRESENCE SET — each batch
    enriches brands via the static dim (stream-static broadcast join), reduces
    to distinct (basket, item), and appends only rows new to the ledger
    (anti-join, the stream_incremental_dedup discipline). Pair generation then
    runs over the folded presence ledger on read — so the result is exactly
    the batch answer regardless of how rows were split into batches, and this
    shares the batch oracle verbatim. Ledger state is |distinct(basket, item)|
    — the same append-only shape as the dedup fingerprint ledger."""
    from movie_genre_data_pipeline_spark.functions.mining import pair_supports
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.mining_queries import (
        PAIR_MIN_SUPPORT,
    )

    base = tempfile.mkdtemp(prefix="stream_mine_")
    src, ledger = f"{base}/src", f"{base}/ledger"
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li.select("l_orderkey", "l_partkey").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        items = (
            batch_df.join(
                F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
            )
            .select(
                F.col("l_orderkey").alias("basket"),
                F.col("p_brand").alias("item"),
            )
            .distinct()
        )
        if os.path.exists(ledger):
            seen = spark.read.parquet(ledger)
            items = items.join(seen, ["basket", "item"], "left_anti")
        items.write.mode("append").parquet(ledger)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = spark.read.parquet(ledger)
    pairs = pair_supports(folded)
    return pairs.filter(F.col("pair_support") >= PAIR_MIN_SUPPORT).select(
        F.col("item_a").alias("brand_a"),
        F.col("item_b").alias("brand_b"),
        "pair_support",
    )


def _stream_mine_pairs_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.mining_queries import (
        Q_MINE_BRAND_PAIRS_ORACLE,
    )

    return Q_MINE_BRAND_PAIRS_ORACLE


QUERIES["stream_mine_pairs"] = QuerySpec(
    q_stream_mine_pairs, _stream_mine_pairs_oracle()
)


def q_stream_ab_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous experiment monitoring: each micro-batch appends its per-user
    purchase-count DELTAS to a ledger; the reader folds by re-sum and runs the
    Welch-t scorecard on the fold. Arms are assigned AFTER folding (a pure
    function of user_id), so batching cannot perturb assignment, and additive
    counts make the fold batch-split- and order-independent — the always-
    current experiment readout shares the batch oracle verbatim. Ledger state
    is one row per (batch, active user)."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        ab_report_from_user_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_ab_")
    src, ledger = f"{base}/src", f"{base}/ledger"
    ev = load(spark, sf_dir, "events")
    ev.select("user_id", "event_type").repartition(4).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.groupBy("user_id").agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("x")
        ).write.mode("append").parquet(ledger)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(ledger)
        .groupBy("user_id")
        .agg(F.sum("x").cast("bigint").alias("x"))
    )
    return ab_report_from_user_counts(folded)


def _stream_ab_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import _ab_oracle

    return _ab_oracle()


QUERIES["stream_ab_report"] = QuerySpec(q_stream_ab_report, _stream_ab_oracle())


# -- continuous model fitting: streaming OLS via the Gram ledger (r7) -------------------
def q_stream_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The always-current regression readout: each micro-batch appends its
    PARTIAL Gram/moment row (exact-integer sums over just that batch's
    orders) to a ledger; the reader folds by component-wise re-sum and runs
    the shared Cramer solve on the fold. Additive integer state makes the
    fold batch-split- and order-independent, so the continuous fit equals the
    batch fit bit-for-bit and SHARES the batch oracle verbatim — the simplest
    possible streaming-ML state: d²+d numbers per batch, no state store."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        ols_gram,
        ols_solve_micro,
    )
    from movie_genre_data_pipeline_spark.suite import load

    base = tempfile.mkdtemp(prefix="stream_ols_")
    src, ledger = f"{base}/src", f"{base}/ledger"
    o = load(spark, sf_dir, "orders")
    o.select(
        (F.col("o_orderkey") % 180 + 60).cast("bigint").alias("x1"),
        (F.col("o_custkey") % 25).cast("bigint").alias("x2"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    ).repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("x1", T.LongType()),
            T.StructField("x2", T.LongType()),
            T.StructField("y", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        ols_gram(batch_df, "x1", "x2", "y").write.mode("append").parquet(ledger)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(ledger)
        .groupBy()
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            *[
                F.sum(c).cast("bigint").alias(c)
                for c in ("sx1", "sx2", "sy", "s11", "s12", "s22", "s1y", "s2y")
            ],
        )
    )
    return ols_solve_micro(folded)


def _stream_ols_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _feat_ols_oracle,
    )

    return _feat_ols_oracle()


QUERIES["stream_ols_normal_eq"] = QuerySpec(
    q_stream_ols_normal_eq, _stream_ols_oracle()
)


def q_stream_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous exponential smoothing — the first RECENCY-WEIGHTED member
    of the streaming-ledger family, and the one whose fold is inherently
    ORDER-SENSITIVE (unlike the additive/presence ledgers): batches must
    arrive in time order, which the fixture guarantees by writing one file
    per time-range bucket with forced ascending mtimes (FileStreamSource
    processes availableNow files in modification-time order) —
    "in-order delivery" is the contract a log-compacted topic or
    time-partitioned landing zone provides in production. State per series
    is BOUNDED: the (EWMA_LAGS−1)-row value tail (the only history the next
    batch's lag window needs), the running global row count (so the
    full-window rn≥16 rule matches the batch query), and the additive
    digest (n/min/max/last). Each batch prepends the carried tail, runs the
    SAME 16-lag integer window, digests only its own full-window rows, and
    writes back the new tail. The final digest equals the batch smoother
    bit-for-bit — shares ts_ewma_events' oracle verbatim."""
    from movie_genre_data_pipeline_spark.fsutil import vacuum_generations
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        _EWMA_FP_SQL,
        _EWMA_OVER,
        EWMA_LAGS,
    )

    base_dir = tempfile.mkdtemp(prefix="stream_ts_ewma_")
    src = f"{base_dir}/src"
    os.makedirs(src)
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    # one file per time-range bucket, mtimes forced ascending = in-order feed
    cuts = base.selectExpr(
        "percentile_approx(event_id, 0.34) AS c1",
        "percentile_approx(event_id, 0.67) AS c2",
    ).collect()[0]
    for i, cond in enumerate(
        (
            F.col("event_id") <= cuts["c1"],
            (F.col("event_id") > cuts["c1"]) & (F.col("event_id") <= cuts["c2"]),
            F.col("event_id") > cuts["c2"],
        )
    ):
        # event_id is assigned in ts order in the fixture tables, so id-range
        # buckets are time-range buckets; coalesce(1) = one file per batch
        base.filter(cond).coalesce(1).write.parquet(f"{base_dir}/b{i}")
        part = next(
            p for p in os.listdir(f"{base_dir}/b{i}") if p.endswith(".parquet")
        )
        dst = f"{src}/bucket_{i}.parquet"
        os.rename(f"{base_dir}/b{i}/{part}", dst)
        os.utime(dst, (1000 * (i + 1), 1000 * (i + 1)))
    feed_schema = spark.read.parquet(src).schema

    gen = {"n": 0}
    empty_tail = spark.createDataFrame(
        [], "event_type string, ts timestamp, event_id bigint, v bigint, base_rn bigint"
    )
    empty_digest = spark.createDataFrame(
        [],
        "event_type string, n_points bigint, ewma_min_fp bigint,"
        " ewma_max_fp bigint, ewma_last_fp bigint, last_rn bigint",
    )
    empty_tail.write.parquet(f"{base_dir}/tail_0")
    empty_digest.write.parquet(f"{base_dir}/digest_0")

    stream = (
        spark.readStream.format("parquet")
        .schema(feed_schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        tail = spark.read.parquet(f"{base_dir}/tail_{gen['n']}")
        digest = spark.read.parquet(f"{base_dir}/digest_{gen['n']}")
        # global row offset per series = max base_rn carried on the tail
        merged = tail.unionByName(
            batch_df.withColumn("base_rn", F.lit(None).cast("bigint"))
        )
        smoothed = merged.selectExpr(
            "event_type",
            "ts",
            "event_id",
            "v",
            "base_rn",
            f"{_EWMA_FP_SQL} AS ewma_fp",
            f"ROW_NUMBER() {_EWMA_OVER} AS local_rn",
        )
        # rebase to global row numbers: tail rows carry their global rn
        offset = smoothed.groupBy("event_type").agg(
            F.coalesce(F.max("base_rn"), F.lit(0)).alias("off"),
            F.coalesce(F.count("base_rn"), F.lit(0)).alias("n_tail"),
        )
        glob = smoothed.join(F.broadcast(offset), "event_type").withColumn(
            "rn", F.col("local_rn") - F.col("n_tail") + F.col("off")
        )
        fresh = glob.filter(F.col("base_rn").isNull())
        contrib = fresh.filter(F.col("rn") >= EWMA_LAGS).groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.min("ewma_fp").cast("bigint").alias("ewma_min_fp"),
            F.max("ewma_fp").cast("bigint").alias("ewma_max_fp"),
            F.expr("MAX_BY(ewma_fp, rn)").cast("bigint").alias("ewma_last_fp"),
            F.max("rn").cast("bigint").alias("last_rn"),
        )
        folded = (
            digest.unionByName(contrib)
            .groupBy("event_type")
            .agg(
                F.sum("n_points").cast("bigint").alias("n_points"),
                F.min("ewma_min_fp").cast("bigint").alias("ewma_min_fp"),
                F.max("ewma_max_fp").cast("bigint").alias("ewma_max_fp"),
                F.expr("MAX_BY(ewma_last_fp, last_rn)")
                .cast("bigint")
                .alias("ewma_last_fp"),
                F.max("last_rn").cast("bigint").alias("last_rn"),
            )
        )
        from pyspark.sql import Window

        wdesc = Window.partitionBy("event_type").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        new_tail = (
            glob.withColumn("__k", F.row_number().over(wdesc))
            .filter(F.col("__k") <= EWMA_LAGS - 1)
            .select("event_type", "ts", "event_id", "v", F.col("rn").alias("base_rn"))
        )
        gen["n"] += 1
        new_tail.write.parquet(f"{base_dir}/tail_{gen['n']}")
        folded.write.parquet(f"{base_dir}/digest_{gen['n']}")
        vacuum_generations(base_dir, "tail", keep=2)
        vacuum_generations(base_dir, "digest", keep=2)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(f"{base_dir}/digest_{gen['n']}").select(
        "event_type", "n_points", "ewma_min_fp", "ewma_max_fp", "ewma_last_fp"
    )


def _stream_ts_ewma_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        Q_TS_EWMA_ORACLE,
    )

    return Q_TS_EWMA_ORACLE


QUERIES["stream_ts_ewma"] = QuerySpec(q_stream_ts_ewma, _stream_ts_ewma_oracle())


def q_stream_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regularization path maintained continuously at ZERO extra state:
    the per-batch partial-Gram ledger stream_ols_normal_eq appends already
    contains everything any λ needs — the λ grid explodes the FOLDED Gram on
    read and the shared Cramer expressions solve each penalized system as a
    projection. Refitting the whole path after new data costs one
    ledger-sized re-sum, never a data rescan; shares feat_ridge_path's batch
    oracle verbatim."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        ols_gram,
        ols_solve_micro,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        RIDGE_LAMBDAS,
    )

    base = tempfile.mkdtemp(prefix="stream_ridge_")
    src, ledger = f"{base}/src", f"{base}/ledger"
    o = load(spark, sf_dir, "orders")
    o.select(
        (F.col("o_orderkey") % 180 + 60).cast("bigint").alias("x1"),
        (F.col("o_custkey") % 25).cast("bigint").alias("x2"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    ).repartition(4).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("x1", T.LongType()),
            T.StructField("x2", T.LongType()),
            T.StructField("y", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        ols_gram(batch_df, "x1", "x2", "y").write.mode("append").parquet(ledger)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(ledger)
        .groupBy()
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            *[
                F.sum(c).cast("bigint").alias(c)
                for c in ("sx1", "sx2", "sy", "s11", "s12", "s22", "s1y", "s2y")
            ],
        )
    )
    lam = folded.select(
        F.explode(
            F.array(*[F.lit(int(l)).cast("bigint") for l in RIDGE_LAMBDAS])
        ).alias("lam"),
        "*",
    )
    penalized = lam.select(
        "lam",
        "n_rows",
        "sx1",
        "sx2",
        "sy",
        (F.col("s11") + F.col("lam")).alias("s11"),
        "s12",
        (F.col("s22") + F.col("lam")).alias("s22"),
        "s1y",
        "s2y",
    )
    return ols_solve_micro(penalized, group_cols=("lam",))


def _stream_ridge_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _feat_ridge_oracle,
    )

    return _feat_ridge_oracle()


QUERIES["stream_ridge_path"] = QuerySpec(q_stream_ridge_path, _stream_ridge_oracle())


# -- continuous refresh of the second gold mart (r8) -----------------------------------
def q_stream_gold_language_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming language-mart refresh — the scalar-FK twin of
    `stream_gold_ivm`: the CDC feed (inserts, deletes, reprices, and
    language MOVES) arrives as arbitrary micro-batches and foreachBatch folds
    each batch's signed contributions into the persisted additive state
    (versioned parquet generations). Additive integral state ⇒ the fold is
    batch-split- and order-independent and the final mart equals the batch
    rebuild bit-for-bit — shares gold_language_revenue_ivm's oracle
    verbatim."""
    from movie_genre_data_pipeline_spark.operators.cdc import snapshot_diff
    from movie_genre_data_pipeline_spark.plans.gold import (
        apply_language_revenue_delta,
        build_language_revenue_state,
        finalize_language_revenue,
    )
    from movie_genre_data_pipeline_spark.suite.pipeline_queries import (
        _gold_language_dim,
        _gold_language_movies,
    )

    base_dir = tempfile.mkdtemp(prefix="stream_gold_lang_ivm_")
    src = f"{base_dir}/src"
    base = _gold_language_movies(spark, sf_dir)
    dim_df = _gold_language_dim(spark, sf_dir)
    snap_a = base.filter(F.col("Id") % 101 != 0)
    snap_b = (
        base.filter(F.col("Id") % 97 != 0)
        .withColumn(
            "Revenue",
            F.when(
                F.col("Id") % 13 == 0,
                F.expr(
                    "CAST((CAST(ROUND(Revenue * 100) AS BIGINT) * 11 + 5) DIV 10 AS DOUBLE) / 100.0"
                ),
            ).otherwise(F.col("Revenue")),
        )
        .withColumn(
            "Language_Id",
            F.when(
                F.col("Id") % 11 == 0,
                ((F.col("Language_Id") + 1) % 5).cast("INTEGER"),
            ).otherwise(F.col("Language_Id")),
        )
    )
    changes = snapshot_diff(
        snap_a, snap_b, ["Id"], ["Revenue", "Budget", "RunTime", "Language_Id"]
    ).filter(F.col("change_type") != "unchanged")
    changes.repartition(_split(3)).write.parquet(src)
    change_schema = spark.read.parquet(src).schema

    gen = {"n": 0}
    build_language_revenue_state(snap_a, dim_df).write.parquet(
        f"{base_dir}/state_0"
    )
    dim = dim_df.localCheckpoint(eager=True)  # reused every micro-batch

    stream = (
        spark.readStream.format("parquet")
        .schema(change_schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from movie_genre_data_pipeline_spark.fsutil import vacuum_generations

        prev = spark.read.parquet(f"{base_dir}/state_{gen['n']}")
        nxt = apply_language_revenue_delta(prev, batch_df, dim)
        gen["n"] += 1
        nxt.write.parquet(f"{base_dir}/state_{gen['n']}")
        vacuum_generations(base_dir, "state", keep=2)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    state = spark.read.parquet(f"{base_dir}/state_{gen['n']}")
    return finalize_language_revenue(state)


def _stream_gold_language_ivm_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.pipeline_queries import (
        Q_GOLD_LANGUAGE_REVENUE_IVM_ORACLE,
    )

    return Q_GOLD_LANGUAGE_REVENUE_IVM_ORACLE


QUERIES["stream_gold_language_ivm"] = QuerySpec(
    q_stream_gold_language_ivm, _stream_gold_language_ivm_oracle()
)


def q_stream_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained DSIR selection: each micro-batch of documents
    appends three ADDITIVE partials — the doc dimension, its (doc, bucket)
    term postings, and its bucket-model counts — and the readout folds them
    into the identical per-source selection report the batch query computes
    (shares `_importance_select_oracle` verbatim). Additivity does the work:
    bucket counts and postings are exact integer sums, so the fold is
    batch-split- and order-independent, and the model stays current without
    ever re-scanning history. The one non-incremental step is the log-ratio
    table — recomputed per readout, but it's ≤ n_buckets rows, so the
    refresh costs O(buckets), not O(corpus)."""
    from movie_genre_data_pipeline_spark.functions.sampling import (
        dsir_bucket_model,
        dsir_fold_scores,
        dsir_postings,
        dsir_term_buckets,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import DSIR_BUCKETS

    b = DSIR_BUCKETS
    base = tempfile.mkdtemp(prefix="stream_dsir_")
    src = f"{base}/src"
    led_doc, led_tf, led_bkt = f"{base}/docs", f"{base}/tf", f"{base}/buckets"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text", "lang", "source").repartition(
        _split(4)
    ).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select("doc_id", "source").write.mode("append").parquet(led_doc)
        terms = dsir_term_buckets(
            batch_df, "doc_id", "text", (F.col("lang") == "en"), b
        )
        dsir_postings(terms).write.mode("append").parquet(led_tf)
        dsir_bucket_model(terms).write.mode("append").parquet(led_bkt)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    buckets = (
        spark.read.parquet(led_bkt)
        .groupBy("bucket")
        .agg(F.sum("raw_c").alias("raw_c"), F.sum("tgt_c").alias("tgt_c"))
    )
    tf = (
        spark.read.parquet(led_tf)
        .groupBy("doc_id", "bucket")
        .agg(F.sum("tf").alias("tf"))
    )
    scored = dsir_fold_scores(tf, buckets, b).select("doc_id", "logw_micro")
    rep = (
        spark.read.parquet(led_doc)
        .join(scored, "doc_id", "left")
        .select(
            "source",
            F.coalesce("logw_micro", F.lit(0)).cast("bigint").alias("logw_micro"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("logw_micro") > 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_selected"),
            F.sum(
                F.when(F.col("logw_micro") > 0, F.col("logw_micro")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("sel_logw_micro"),
        )
    )
    return rep.select(
        "source",
        "n_docs",
        "n_selected",
        F.round(F.col("n_selected").cast("double") / F.col("n_docs"), 6).alias(
            "sel_rate"
        ),
        F.when(
            F.col("n_selected") > 0,
            F.round(
                F.col("sel_logw_micro").cast("double")
                / F.lit(1e6)
                / F.col("n_selected"),
                6,
            ),
        ).alias("avg_sel_logw"),
    )


def _stream_importance_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _importance_select_oracle,
    )

    return _importance_select_oracle()


QUERIES["stream_importance_weights"] = QuerySpec(
    q_stream_importance_weights, _stream_importance_oracle()
)


def _span_gram_postings(batch_df: DataFrame, l: int) -> DataFrame:
    """(doc, i, h48): one length-`l` token-window posting per position — the
    append-only FACT a micro-batch contributes to a span-dedup ledger. Pure
    per-document projection (computable at arrival); the corpus-global
    occurrence decision folds over the accumulated postings at readout
    (functions/dedup.duplicate_spans_from_grams). Same md5-48-bit window
    hash as the batch operator, so ledger readouts share its oracle."""
    from movie_genre_data_pipeline_spark.functions.text import tokens

    toks = batch_df.select(
        F.col("doc_id").alias("doc"), tokens("text").alias("__toks")
    )
    return (
        toks.filter(F.size("__toks") >= l)
        .select(
            "doc",
            "__toks",
            F.explode(
                F.sequence(F.lit(1), F.size("__toks") - F.lit(l - 1))
            ).alias("i"),
        )
        .select(
            "doc",
            "i",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", F.slice("__toks", F.col("i"), l))),
                    1,
                    12,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h48"),
        )
    )


def q_stream_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous span-level dedup (verdict r8 #7) — the streaming twin of
    dedup_duplicate_spans, decomposed by the suite's streaming rule:
    scan-local per-row stats (token counts) decide at ARRIVAL; the
    corpus-global gram-occurrence statistic appends additive FACTS (the
    (doc, i, h48) window postings) and decides at READOUT. Each micro-batch
    appends its doc-dim rows and gram postings; the readout runs the
    occurrence window + gaps-and-islands merge over the accumulated ledger
    (functions/dedup.duplicate_spans_from_grams) and emits the IDENTICAL
    per-document report as the batch operator — shared oracle verbatim,
    micro-batch-split invariance pinned in
    tests/test_stream_split_invariance.py."""
    from movie_genre_data_pipeline_spark.functions.dedup import (
        duplicate_spans_from_grams,
    )
    from movie_genre_data_pipeline_spark.functions.text import token_count
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.dedup_queries import DUP_SPAN_L

    base = tempfile.mkdtemp(prefix="stream_spans_")
    src, led_doc, led_gram = f"{base}/src", f"{base}/docs", f"{base}/grams"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            "doc_id", token_count("text").alias("n_tokens")
        ).write.mode("append").parquet(led_doc)
        _span_gram_postings(batch_df, DUP_SPAN_L).write.mode("append").parquet(
            led_gram
        )

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    docs = spark.read.parquet(led_doc)
    return duplicate_spans_from_grams(
        spark.read.parquet(led_gram),
        docs.select(F.col("doc_id").alias("doc"), "n_tokens"),
        DUP_SPAN_L,
    )


def _stream_duplicate_spans_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.dedup_queries import (
        _duplicate_spans_oracle,
    )

    return _duplicate_spans_oracle()


QUERIES["stream_duplicate_spans"] = QuerySpec(
    q_stream_duplicate_spans, _stream_duplicate_spans_oracle()
)


def q_stream_trainset_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous curation: the whole trainset funnel maintained from
    append-only ledgers. Each micro-batch of documents appends (a) its doc
    ledger row — doc_id, whitespace token count, and the scan-local quality
    score (both pure per-doc projections, computable the moment the doc
    arrives); (b) its length-6 gram postings (doc, i, h48); and (c) the two
    DSIR partials (term postings + bucket-model counts). The readout folds
    the ledgers — occurrence window + island merge over the gram postings,
    bucket-model ratios over the DSIR partials — rebuilds the scored flags,
    and emits the IDENTICAL 7-row funnel manifest as the batch query
    (shared oracle verbatim). Corpus-global statistics (gram occurrence,
    bucket models) are exactly the parts a per-batch filter CANNOT decide;
    storing their additive facts and deciding at readout is what makes the
    continuous funnel equal the batch funnel bit-for-bit."""
    from movie_genre_data_pipeline_spark.functions.dedup import (
        duplicate_spans_from_grams,
    )
    from movie_genre_data_pipeline_spark.functions.sampling import (
        dsir_bucket_model,
        dsir_fold_scores,
        dsir_postings,
        dsir_term_buckets,
    )
    from movie_genre_data_pipeline_spark.functions.text import (
        quality_score,
        token_count,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        DSIR_BUCKETS,
        FUNNEL_DSIR_MIN_MICRO,
        FUNNEL_DUP_MAX,
        FUNNEL_QUALITY_MIN,
        _funnel_report,
    )

    b = DSIR_BUCKETS
    base = tempfile.mkdtemp(prefix="stream_funnel_")
    src = f"{base}/src"
    led_doc, led_gram = f"{base}/docs", f"{base}/grams"
    led_tf, led_bkt = f"{base}/tf", f"{base}/buckets"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text", "lang").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    L = 6

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            "doc_id",
            token_count("text").alias("n_tokens"),
            quality_score("text").alias("quality"),
        ).write.mode("append").parquet(led_doc)
        _span_gram_postings(batch_df, L).write.mode("append").parquet(led_gram)
        terms = dsir_term_buckets(
            batch_df, "doc_id", "text", (F.col("lang") == "en"), b
        )
        dsir_postings(terms).write.mode("append").parquet(led_tf)
        dsir_bucket_model(terms).write.mode("append").parquet(led_bkt)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    docs = spark.read.parquet(led_doc)
    spans = duplicate_spans_from_grams(
        spark.read.parquet(led_gram),
        docs.select(F.col("doc_id").alias("doc"), "n_tokens"),
        L,
    ).select("doc_id", "dup_fraction")
    buckets = (
        spark.read.parquet(led_bkt)
        .groupBy("bucket")
        .agg(F.sum("raw_c").alias("raw_c"), F.sum("tgt_c").alias("tgt_c"))
    )
    tf = (
        spark.read.parquet(led_tf)
        .groupBy("doc_id", "bucket")
        .agg(F.sum("tf").alias("tf"))
    )
    w = dsir_fold_scores(tf, buckets, b)
    scored = (
        docs.join(spans, "doc_id")
        .join(w.select("doc_id", "logw_micro"), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("dup_fraction") < F.lit(FUNNEL_DUP_MAX)).alias("s2"),
            (
                (F.col("dup_fraction") < F.lit(FUNNEL_DUP_MAX))
                & (F.col("quality") >= F.lit(FUNNEL_QUALITY_MIN))
            ).alias("s3"),
            (
                (F.col("dup_fraction") < F.lit(FUNNEL_DUP_MAX))
                & (F.col("quality") >= F.lit(FUNNEL_QUALITY_MIN))
                & (
                    F.coalesce("logw_micro", F.lit(0))
                    > F.lit(FUNNEL_DSIR_MIN_MICRO)
                )
            ).alias("s4"),
        )
        .localCheckpoint(eager=False)
    )
    from movie_genre_data_pipeline_spark.suite.sampling_queries import _funnel_report

    return _funnel_report(scored)


def _stream_funnel_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _trainset_funnel_oracle,
    )

    return _trainset_funnel_oracle()


QUERIES["stream_trainset_funnel"] = QuerySpec(
    q_stream_trainset_funnel, _stream_funnel_oracle()
)


def q_stream_pca_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained PCA: each micro-batch appends its partial
    exact-integer moment row (n, Σx_i, Σx_i·x_j — the d²-sized ledger the
    covariance derives from); the reader folds by component-wise re-sum and
    runs the identical scan-free power iterations, so the continuous top
    component equals the batch fit bit-for-bit and shares feat_pca_power's
    oracle verbatim. The cheapest possible streaming-ML state: 15 numbers
    per batch."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        PCA_D,
        pca_moments,
        pca_power_from_moments,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _PCA_FEATS,
        PCA_ITERS,
    )

    base = tempfile.mkdtemp(prefix="stream_pca_")
    src, ledger = f"{base}/src", f"{base}/ledger"
    o = load(spark, sf_dir, "orders")
    o.selectExpr(
        *[f"CAST({expr} AS BIGINT) AS {name}" for name, expr in _PCA_FEATS]
    ).repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [T.StructField(name, T.LongType()) for name, _ in _PCA_FEATS]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    cols = [n for n, _ in _PCA_FEATS]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        pca_moments(batch_df, cols).write.mode("append").parquet(ledger)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    names = [f"s{i}" for i in range(1, PCA_D + 1)] + [
        f"s{i}{j}" for i in range(1, PCA_D + 1) for j in range(i, PCA_D + 1)
    ]
    folded = (
        spark.read.parquet(ledger)
        .groupBy()
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            *[F.sum(c).cast("decimal(38,0)").alias(c) for c in names],
        )
    )
    return pca_power_from_moments(folded, iters=PCA_ITERS)


def _stream_pca_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import _pca_oracle

    return _pca_oracle()


QUERIES["stream_pca_moments"] = QuerySpec(q_stream_pca_moments, _stream_pca_oracle())


def q_stream_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous bigram-LM scoring (r9) — the ledger twin of
    text_bigram_surprisal under the suite's streaming decomposition: a
    document's bigram and unigram frequencies are pure per-row projections
    (computable at ARRIVAL), but the MODEL they score against — corpus bigram
    counts, left-context totals, the unigram distribution — is corpus-global,
    so each micro-batch appends its additive count FACTS and the conditional
    probabilities fold at READOUT (functions/text.bigram_surprisal_from_counts,
    the same tail the batch query runs). Shared oracle verbatim; split
    invariance pinned in tests/test_stream_split_invariance.py."""
    from movie_genre_data_pipeline_spark.functions.text import (
        bigram_surprisal_from_counts,
    )
    from movie_genre_data_pipeline_spark.suite import load

    base = tempfile.mkdtemp(prefix="stream_bigram_")
    src, led_bf, led_uni = f"{base}/src", f"{base}/bf", f"{base}/uni"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        bigram_ledger_append(batch_df, led_bf, led_uni)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    bf, uni = bigram_ledger_counts(spark, led_bf, led_uni)
    return bigram_surprisal_from_counts(bf, uni)


def _stream_bigram_surprisal_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_BIGRAM_SURPRISAL_ORACLE,
    )

    return Q_BIGRAM_SURPRISAL_ORACLE


QUERIES["stream_bigram_surprisal"] = QuerySpec(
    q_stream_bigram_surprisal, _stream_bigram_surprisal_oracle()
)


def q_stream_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained BM25 ranking (r9) — the retrieval index a RAG
    platform keeps fresh as documents land: a document's term postings and
    length are pure per-row projections (decided at ARRIVAL), while df, the
    corpus totals, and therefore every score are corpus-global (decided at
    READOUT from the folded ledgers). Each micro-batch appends its
    (doc, term, tf) postings for the query's terms and its (doc, dl) length
    rows; the readout folds by SUM and runs the identical scoring tail as
    the batch ranker (text_queries.bm25_from_counts) — shared oracle
    verbatim, split invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load

    base = tempfile.mkdtemp(prefix="stream_bm25_")
    src, led_tf, led_dl = f"{base}/src", f"{base}/tf", f"{base}/dl"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        bm25_append_postings(batch_df, led_tf, led_dl)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    return bm25_fold_ledgers(spark, led_tf, led_dl)


def bm25_append_postings(batch_df: DataFrame, led_tf: str, led_dl: str) -> None:
    """One micro-batch's additive BM25 facts: (doc, term, tf) postings for
    the query terms and (doc, dl) length rows, appended to the two parquet
    ledgers. Module-level (not a closure) so the compaction test can replay
    the exact production append path."""
    from movie_genre_data_pipeline_spark.suite.text_queries import BM25_TERMS

    docs = alpha_token_docs(batch_df)
    docs.select(
        "doc_id", F.size("__a").cast("bigint").alias("dl")
    ).write.mode("append").parquet(led_dl)
    (
        docs.select("doc_id", F.explode("__a").alias("term"))
        .filter(F.col("term").isin(list(BM25_TERMS)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .write.mode("append")
        .parquet(led_tf)
    )


def bm25_ledger_counts(
    spark: SparkSession, led_tf: str, led_dl: str
) -> tuple[DataFrame, DataFrame]:
    """(tf, dl) count tables folded by SUM from the append ledgers — the
    shared readout input for every ranker over these postings (BM25 and the
    RRF fusion). A pure function of ledger ROWS: file layout is irrelevant,
    which is what makes small-file compaction of a live ledger safe (pinned
    by tests/test_compact.py's mid-stream compaction test)."""
    tf = (
        spark.read.parquet(led_tf)
        .groupBy("doc_id", "term")
        .agg(F.sum("tf").cast("bigint").alias("tf"))
    )
    dl = (
        spark.read.parquet(led_dl)
        .groupBy("doc_id")
        .agg(F.sum("dl").cast("bigint").alias("dl"))
    )
    return tf, dl


def bm25_fold_ledgers(spark: SparkSession, led_tf: str, led_dl: str) -> DataFrame:
    """Fold the append ledgers and run the identical scoring tail as the
    batch ranker (text_queries.bm25_from_counts)."""
    from movie_genre_data_pipeline_spark.suite.text_queries import bm25_from_counts

    tf, dl = bm25_ledger_counts(spark, led_tf, led_dl)
    return bm25_from_counts(tf, dl)


def _stream_bm25_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_BM25_TOPK_ORACLE,
    )

    return Q_BM25_TOPK_ORACLE


QUERIES["stream_bm25_topk"] = QuerySpec(q_stream_bm25_topk, _stream_bm25_oracle())


def q_stream_ams_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained AMS join-size estimate (r9) — the sketch that
    makes this ledger family complete for an optimizer: each micro-batch
    appends its REPS-sized signed-sum partials (Z is a plain sum, the most
    additive fact there is) plus its per-user frequency partials for the
    audit column; the readout folds by component-wise re-sum and publishes
    the identical estimate row as the batch query (shared oracle verbatim,
    split-invariance gated). State per batch: AMS_REPS rows per side + the
    touched users."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sketch_queries import (
        AMS_REPS,
        _ams_signs,
    )

    base = tempfile.mkdtemp(prefix="stream_ams_")
    src, led_z, led_f = f"{base}/src", f"{base}/z", f"{base}/f"
    ev = load(spark, sf_dir, "events")
    ev.select("event_id", "user_id", "event_type").repartition(
        _split(4)
    ).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        both = batch_df.filter(F.col("event_type").isin("view", "purchase"))
        (
            both.select("event_type", F.posexplode(_ams_signs()).alias("j0", "sgn"))
            .groupBy("event_type", (F.col("j0") + F.lit(1)).alias("j"))
            .agg(F.sum("sgn").cast("bigint").alias("z"))
            .write.mode("append")
            .parquet(led_z)
        )
        both.groupBy("event_type", "user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("f")
        ).write.mode("append").parquet(led_f)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    z = (
        spark.read.parquet(led_z)
        .groupBy("event_type", "j")
        .agg(F.sum("z").cast("bigint").alias("z"))
    )
    zr = z.filter(F.col("event_type") == "view").select("j", F.col("z").alias("z_r"))
    zs = z.filter(F.col("event_type") == "purchase").select(
        "j", F.col("z").alias("z_s")
    )
    est = (
        zr.join(zs, "j")
        .agg(F.sum(F.col("z_r") * F.col("z_s")).cast("bigint").alias("prod_sum"))
        .selectExpr(
            f"CAST({AMS_REPS} AS BIGINT) AS reps",
            f"CAST(prod_sum AS DOUBLE) / {AMS_REPS} AS est_join_size",
        )
    )
    f = (
        spark.read.parquet(led_f)
        .groupBy("event_type", "user_id")
        .agg(F.sum("f").cast("bigint").alias("f"))
    )
    views = f.filter(F.col("event_type") == "view").select(
        "user_id", F.col("f").alias("fr")
    )
    purch = f.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("f").alias("fs")
    )
    true_sz = views.join(purch, "user_id").agg(
        F.sum(F.col("fr") * F.col("fs")).cast("bigint").alias("true_join_size")
    )
    return est.crossJoin(F.broadcast(true_sz)).selectExpr(
        "reps",
        "est_join_size",
        "true_join_size",
        "CAST(ROUND((est_join_size - CAST(true_join_size AS DOUBLE))"
        " / CAST(true_join_size AS DOUBLE) * CAST(1000000 AS DOUBLE)) AS BIGINT)"
        " AS rel_err_micro",
    )


def _stream_ams_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sketch_queries import (
        Q_AMS_JOIN_SIZE_ORACLE,
    )

    return Q_AMS_JOIN_SIZE_ORACLE


QUERIES["stream_ams_join_size"] = QuerySpec(
    q_stream_ams_join_size, _stream_ams_oracle()
)


def alpha_token_docs(batch_df: DataFrame) -> DataFrame:
    """(doc_id, __a) with the LOWERCASE ALPHA tokens — the shared tokenize
    projection of every text-ledger append (bigram LM, BM25, Heaps, RRF).
    alpha_tokens is the one definition in functions/text.py, so ledger facts
    are bit-identical to the batch builders and the shared oracles by
    construction, on ANY text (case/digits/punct)."""
    from movie_genre_data_pipeline_spark.functions.text import alpha_tokens

    return batch_df.select("doc_id", alpha_tokens("text").alias("__a"))


def bigram_ledger_append(batch_df: DataFrame, led_bf: str, led_uni: str) -> None:
    """One micro-batch's additive bigram-LM facts — (doc_id, w1, w2, bf)
    bigram counts and (w2, cu) unigram counts — appended to the two parquet
    ledgers. Module-level (not a closure) so the four consumers
    (stream_bigram_surprisal, stream_surprisal_filter and their readout
    folds) share ONE definition; drift between copies would ship
    oracle-green because both engines run the same string (VERDICT r10 #5)."""
    from movie_genre_data_pipeline_spark.functions.text import bigram_pairs

    docs = alpha_token_docs(batch_df)
    bg = bigram_pairs("__a")
    (
        docs.select("doc_id", F.explode(bg).alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("bf"))
        .write.mode("append")
        .parquet(led_bf)
    )
    (
        docs.select(F.explode("__a").alias("w2"))
        .groupBy("w2")
        .agg(F.count(F.lit(1)).alias("cu"))
        .write.mode("append")
        .parquet(led_uni)
    )


def bigram_ledger_counts(
    spark: SparkSession, led_bf: str, led_uni: str
) -> tuple[DataFrame, DataFrame]:
    """(bf, uni) count tables folded by SUM from the append ledgers — the
    shared readout input for bigram_surprisal_from_counts. A pure function
    of ledger ROWS (file layout irrelevant), like bm25_ledger_counts."""
    bf = (
        spark.read.parquet(led_bf)
        .groupBy("doc_id", "w1", "w2")
        .agg(F.sum("bf").alias("bf"))
    )
    uni = spark.read.parquet(led_uni).groupBy("w2").agg(F.sum("cu").alias("cu"))
    return bf, uni


def q_stream_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous CCNet-style quality filtering (r9) — the twin of
    curate_surprisal_filter under the arrival/readout rule: a document's
    bigram/unigram count facts and its source land at arrival; the LM the
    filter scores against is corpus-global, so every keep/drop decision
    folds at READOUT from the accumulated ledgers
    (text.bigram_surprisal_from_counts → threshold → per-source report).
    This is the honest form of a streaming perplexity filter: the model
    keeps LEARNING as data lands, so early documents are re-judged under
    the final model — batch ≡ continuous bit-for-bit, shared oracle
    verbatim, split-invariance gated."""
    from movie_genre_data_pipeline_spark.functions.text import (
        bigram_surprisal_from_counts,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.curation_queries import (
        SURPRISAL_KEEP_MAX,
    )

    base = tempfile.mkdtemp(prefix="stream_surp_")
    src = f"{base}/src"
    led_bf, led_uni, led_src = f"{base}/bf", f"{base}/uni", f"{base}/srcdim"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text", "source").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        bigram_ledger_append(batch_df, led_bf, led_uni)
        batch_df.select("doc_id", "source").write.mode("append").parquet(led_src)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    bf, uni = bigram_ledger_counts(spark, led_bf, led_uni)
    scored = bigram_surprisal_from_counts(bf, uni)
    srcdim = spark.read.parquet(led_src)
    keep = F.col("avg_surprisal") < F.lit(SURPRISAL_KEEP_MAX)
    return (
        scored.join(srcdim, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.expr(
                "CAST(ROUND(CAST(SUM(CASE WHEN avg_surprisal"
                f" < CAST({SURPRISAL_KEEP_MAX} AS DOUBLE) THEN 1 ELSE 0 END)"
                " AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
                " * CAST(1000000 AS DOUBLE)) AS BIGINT)"
            ).alias("kept_share_micro"),
        )
    )


def _stream_surprisal_filter_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.curation_queries import (
        _surprisal_filter_oracle,
    )

    return _surprisal_filter_oracle()


QUERIES["stream_surprisal_filter"] = QuerySpec(
    q_stream_surprisal_filter, _stream_surprisal_filter_oracle()
)


def q_stream_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous vocabulary-growth curve (r9) — two decompositions the other
    ledgers don't exercise: (a) the type ledger folds by MIN (each batch
    appends every term's lowest doc_id; first-occurrence = min-merge, the
    min-fold sibling of the HLL max-fold), and (b) even the BUCKETING is a
    readout decision — a bucket is ⌊id·8/(max_id+1)⌋ of the FINAL corpus, so
    the whole curve legitimately re-buckets as data lands, and min-doc-id per
    term maps to min-bucket because the bucket function is monotone in id.
    Batch ≡ continuous bit-for-bit; shares the batch oracle verbatim;
    split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.text_queries import HEAPS_BUCKETS

    base = tempfile.mkdtemp(prefix="stream_heaps_")
    src, led_term, led_doc = f"{base}/src", f"{base}/terms", f"{base}/docs"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs_b = alpha_token_docs(batch_df)
        docs_b.select("doc_id", F.explode("__a").alias("term")).groupBy(
            "term"
        ).agg(F.min("doc_id").alias("first_doc")).write.mode("append").parquet(
            led_term
        )
        # EVERY document appends a (doc_id, n_tokens) row — n_tokens may be 0
        # (digits/punct/non-Latin text tokenizes to empty). The doc ledger is
        # the readout's source of n_ids = MAX(doc_id)+1, and the batch query
        # plus shared oracle take that MAX over ALL documents; deriving it
        # from exploded-token rows would shift every bucket boundary whenever
        # the max-id document has no [a-z] run (ADVICE r9, medium).
        docs_b.select(
            "doc_id", F.size("__a").cast("bigint").alias("n_tokens")
        ).write.mode("append").parquet(led_doc)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    from pyspark.sql import Window

    docs = (
        spark.read.parquet(led_doc)
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").cast("bigint").alias("n_tokens"))
    )
    terms = (
        spark.read.parquet(led_term)
        .groupBy("term")
        .agg(F.min("first_doc").alias("first_doc"))
    )
    mx = docs.agg((F.max("doc_id") + F.lit(1)).cast("bigint").alias("n_ids"))
    bucket_of = (
        f"CAST(FLOOR(CAST({{col}} * {HEAPS_BUCKETS} AS DOUBLE)"
        " / CAST(n_ids AS DOUBLE)) AS BIGINT)"
    )
    # zero-token docs exist in the ledger ONLY to pin n_ids; the batch
    # per-bucket aggregate sees buckets that own >=1 token, so drop them
    # before bucketing (a bucket of only zero-token docs must emit no row)
    per_bucket = (
        docs.filter(F.col("n_tokens") > 0)
        .crossJoin(F.broadcast(mx))
        .selectExpr(f"{bucket_of.format(col='doc_id')} AS bucket", "n_tokens")
        .groupBy("bucket")
        .agg(F.sum("n_tokens").cast("bigint").alias("n_tokens"))
    )
    new_types = (
        terms.crossJoin(F.broadcast(mx))
        .selectExpr(f"{bucket_of.format(col='first_doc')} AS bucket")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(new_types, "bucket", "left")
        .select(
            "bucket",
            "n_tokens",
            F.coalesce("new_types", F.lit(0)).cast("bigint").alias("new_types"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .withColumn("cum_types", F.sum("new_types").over(w).cast("bigint"))
        .selectExpr(
            "bucket",
            "n_tokens",
            "new_types",
            "cum_tokens",
            "cum_types",
            "CAST(ROUND(CAST(cum_types AS DOUBLE) / CAST(cum_tokens AS DOUBLE)"
            " * CAST(1000000 AS DOUBLE)) AS BIGINT) AS ttr_micro",
        )
    )


def _stream_heaps_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_HEAPS_VOCAB_GROWTH_ORACLE,
    )

    return Q_HEAPS_VOCAB_GROWTH_ORACLE


QUERIES["stream_heaps_vocab_growth"] = QuerySpec(
    q_stream_heaps_vocab_growth, _stream_heaps_oracle()
)


def q_stream_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous packing audit (r10) — the streaming twin of
    sample_pack_efficiency under the suite's decomposition rule: a document's
    token count is a pure per-row projection (decided at ARRIVAL), but its
    CHUNK is not — chunk_id depends on the running token total of every
    lower-id document in the same language, so packing is a READOUT decision.
    Each micro-batch appends (lang, doc_id, n_tokens) facts; the readout
    folds by SUM and runs the identical pack-window + audit tail as the
    batch query (sampling_queries.pack_efficiency_from_counts) — shared
    oracle verbatim, split invariance gated."""
    from movie_genre_data_pipeline_spark.functions.text import token_count
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        pack_efficiency_from_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_pack_")
    src, led = f"{base}/src", f"{base}/toks"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text", "lang").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            "lang", "doc_id", token_count("text").alias("n_tokens")
        ).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    t = (
        spark.read.parquet(led)
        .groupBy("lang", "doc_id")
        .agg(F.sum("n_tokens").cast("bigint").alias("n_tokens"))
    )
    return pack_efficiency_from_counts(t)


def _stream_pack_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        Q_SAMPLE_PACK_EFFICIENCY_ORACLE,
    )

    return Q_SAMPLE_PACK_EFFICIENCY_ORACLE


QUERIES["stream_pack_efficiency"] = QuerySpec(
    q_stream_pack_efficiency, _stream_pack_oracle()
)


def q_stream_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained hybrid retrieval (r10) — the RRF fusion of the
    BM25 and query-likelihood rankers over the SAME postings ledgers the
    continuous BM25 index already appends (bm25_append_postings: per-batch
    (doc,term,tf) + (doc,dl) arrival facts). Both rankers, both top-k lists,
    and the fused ordering are READOUT decisions over the folded counts
    (text_queries.rrf_fusion_from_counts — the identical tail the batch
    query runs). Shared oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        rrf_fusion_from_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_rrf_")
    src, led_tf, led_dl = f"{base}/src", f"{base}/tf", f"{base}/dl"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        bm25_append_postings(batch_df, led_tf, led_dl)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    tf, dl = bm25_ledger_counts(spark, led_tf, led_dl)
    return rrf_fusion_from_counts(tf, dl)


def _stream_rrf_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_RRF_FUSION_ORACLE,
    )

    return Q_RRF_FUSION_ORACLE


QUERIES["stream_rrf_fusion"] = QuerySpec(q_stream_rrf_fusion, _stream_rrf_oracle())


def q_stream_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous Zipf rank-frequency fit (r10) — the simplest possible
    member of the ledger family (per-batch unigram count facts, SUM fold)
    feeding the same top-K + micro-nat OLS tail as the batch query
    (text_queries.zipf_fit_from_counts): rank, both logs, and the fitted
    line are all READOUT decisions, so the slope legitimately keeps moving
    as the corpus grows. Shared oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        zipf_fit_from_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_zipf_")
    src, led = f"{base}/src", f"{base}/counts"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            alpha_token_docs(batch_df)
            .select(F.explode("__a").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .write.mode("append")
            .parquet(led)
        )

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    counts = (
        spark.read.parquet(led)
        .groupBy("term")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return zipf_fit_from_counts(counts)


def _stream_zipf_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import Q_ZIPF_FIT_ORACLE

    return Q_ZIPF_FIT_ORACLE


QUERIES["stream_zipf_fit"] = QuerySpec(q_stream_zipf_fit, _stream_zipf_oracle())


def q_stream_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous blob shard-placement audit (r10) — the multimodal family's
    first streaming member: a blob's shard is a pure md5 function of its id
    (decided at ARRIVAL), so each micro-batch appends its (shard, n_media,
    total_bytes) partials and the always-current balance report folds by SUM
    at readout (multimodal_queries.shard_balance_from_facts — the identical
    tail the batch audit runs). Shared oracle verbatim; split-invariance
    gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.multimodal_queries import (
        media_shard_facts,
        shard_balance_from_facts,
    )

    base = tempfile.mkdtemp(prefix="stream_shard_")
    src, led = f"{base}/src", f"{base}/facts"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        media = batch_df.select(
            F.col("doc_id").alias("media_id"),
            F.col("text").cast("binary").alias("payload"),
        )
        media_shard_facts(media).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    return shard_balance_from_facts(spark.read.parquet(led))


def _stream_shard_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.multimodal_queries import (
        Q_MEDIA_SHARD_BALANCE_ORACLE,
    )

    return Q_MEDIA_SHARD_BALANCE_ORACLE


QUERIES["stream_shard_balance"] = QuerySpec(
    q_stream_shard_balance, _stream_shard_oracle()
)


def q_stream_retention_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous retention-policy (TTL) audit (r11, VERDICT r10 #7) — the
    governance family's streaming member: a row's day bucket and user key are
    pure projections (decided at ARRIVAL), while the retention horizon —
    max event time minus RETENTION_DAYS — is corpus-global, so expiry is a
    READOUT decision that legitimately re-judges every day partition as later
    data lands. Each micro-batch appends (d_bucket, user_id, n_rows) partials
    (the COUNT DISTINCT forces the user key into the fact grain — SUM-fold
    then count rows) plus a 1-row max-ts fact (MAX fold, the HLL-style
    sibling of the Heaps MIN fold). Readout folds and runs the identical
    tail as the batch audit (timeseries_queries.retention_from_counts).
    Shared oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.operators.timeseries import epoch_micros
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        retention_day_user_facts,
        retention_from_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_retention_")
    src, led_day, led_mx = f"{base}/src", f"{base}/day", f"{base}/mx"
    e = load(spark, sf_dir, "events")
    e.select("user_id", "ts").repartition(_split(4)).write.parquet(src)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        retention_day_user_facts(batch_df).write.mode("append").parquet(led_day)
        batch_df.agg(
            F.max(epoch_micros("ts")).cast("bigint").alias("mx_us")
        ).write.mode("append").parquet(led_mx)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    per_user = (
        spark.read.parquet(led_day)
        .groupBy("d_bucket", "user_id")
        .agg(F.sum("n_rows").cast("bigint").alias("n_rows"))
    )
    mx = spark.read.parquet(led_mx).agg(
        F.max("mx_us").cast("bigint").alias("mx_us")
    )
    return retention_from_counts(per_user, mx)


def _stream_retention_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        Q_RETENTION_POLICY_ORACLE,
    )

    return Q_RETENTION_POLICY_ORACLE


QUERIES["stream_retention_policy"] = QuerySpec(
    q_stream_retention_policy, _stream_retention_oracle()
)


def q_stream_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous k-anonymity audit (r11) — the governance family's second
    ledger twin: a row's quasi-identifier key (nation x segment x balance
    band) is a pure projection (decided at ARRIVAL), while the at-risk
    verdict g_size < k is corpus-global — a group under k in an early batch
    may clear the bar as later rows land, so every group is re-judged at
    READOUT over the SUM-folded cardinality ledger. Each micro-batch appends
    its (QI, g_size) partials (cdc_queries.k_anonymity_group_facts); the
    readout folds and runs the identical segment rollup
    (cdc_queries.k_anonymity_from_groups). Shared oracle verbatim;
    split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.cdc_queries import (
        k_anonymity_from_groups,
        k_anonymity_group_facts,
    )

    base = tempfile.mkdtemp(prefix="stream_kanon_")
    src, led = f"{base}/src", f"{base}/groups"
    c = load(spark, sf_dir, "customer")
    c.select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal").repartition(
        _split(4)
    ).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            # c_nationkey is INT32 in the fixture parquet; the file-source
            # schema must match the physical type or the scan fails
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        k_anonymity_group_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(led)
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.sum("g_size").cast("bigint").alias("g_size"))
    )
    return k_anonymity_from_groups(folded)


def _stream_k_anonymity_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.cdc_queries import (
        Q_K_ANONYMITY_ORACLE,
    )

    return Q_K_ANONYMITY_ORACLE


QUERIES["stream_k_anonymity"] = QuerySpec(
    q_stream_k_anonymity, _stream_k_anonymity_oracle()
)


def q_stream_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous corpus-diversity report (r11) — the entropy/Simpson twin
    over the SAME (term, cnt) unigram ledger the continuous Zipf fit
    appends: counts are pure additive facts (decided at ARRIVAL), while
    both diversity statistics are functions of the FINAL distribution, so
    they fold at READOUT (text_queries.entropy_from_counts — the identical
    tail the batch query runs). Shared oracle verbatim; split-invariance
    gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        entropy_from_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_entropy_")
    src, led = f"{base}/src", f"{base}/counts"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            alpha_token_docs(batch_df)
            .select(F.explode("__a").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .write.mode("append")
            .parquet(led)
        )

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    counts = (
        spark.read.parquet(led)
        .groupBy("term")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return entropy_from_counts(counts)


def _stream_entropy_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_UNIGRAM_ENTROPY_ORACLE,
    )

    return Q_UNIGRAM_ENTROPY_ORACLE


QUERIES["stream_unigram_entropy"] = QuerySpec(
    q_stream_unigram_entropy, _stream_entropy_oracle()
)


def q_stream_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained image near-dup index (r11) — the multimodal
    family's second streaming member: a blob's dHash fingerprint is a pure
    per-row projection (decided at ARRIVAL — the expensive decode+hash runs
    exactly once per blob), while near-dup PAIRING is corpus-global (a new
    image can collide with one that landed hours ago), so banding, candidate
    joins, and hamming verdicts all run at READOUT over the accumulated
    fingerprint ledger (multimodal.phash_near_dup_pairs — the identical tail
    the batch query runs; ids are unique across batches so the ledger fold
    is plain union). Shared oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.functions.multimodal import (
        phash_fingerprints,
        phash_near_dup_pairs,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.multimodal_queries import (
        PHASH_BANDS,
        PHASH_MAX_HAMMING,
    )

    base = tempfile.mkdtemp(prefix="stream_phash_")
    src, led = f"{base}/src", f"{base}/fps"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        media = batch_df.select(
            F.col("doc_id").alias("media_id"),
            F.col("text").cast("binary").alias("payload"),
        )
        phash_fingerprints(media, fake_decode=True).write.mode(
            "append"
        ).parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    pairs = phash_near_dup_pairs(
        spark.read.parquet(led),
        max_hamming=PHASH_MAX_HAMMING,
        bands=PHASH_BANDS,
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming")
    )


def _stream_phash_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.multimodal_queries import (
        _phash_oracle,
    )

    return _phash_oracle()


QUERIES["stream_phash_dedup"] = QuerySpec(
    q_stream_phash_dedup, _stream_phash_oracle()
)


def q_stream_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained mutual information (r11) — the feature-
    relevance statistic kept fresh as facts land: a row's contingency cell
    (priority, status) is a pure projection (decided at ARRIVAL), while MI,
    both marginals, and the entropies are functions of the FINAL joint
    distribution, so everything folds at READOUT from the SUM-folded cell
    ledger (sampling_queries.mutual_info_from_cells — the identical tail
    the batch query runs). Shared oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        mutual_info_from_cells,
    )

    base = tempfile.mkdtemp(prefix="stream_mi_")
    src, led = f"{base}/src", f"{base}/cells"
    o = load(spark, sf_dir, "orders")
    o.select("o_orderpriority", "o_orderstatus").repartition(
        _split(4)
    ).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_orderstatus", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(
                F.col("o_orderpriority").alias("x"),
                F.col("o_orderstatus").alias("y"),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
            .write.mode("append")
            .parquet(led)
        )

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    cells = (
        spark.read.parquet(led)
        .groupBy("x", "y")
        .agg(F.sum("n_xy").cast("bigint").alias("n_xy"))
    )
    return mutual_info_from_cells(cells)


def _stream_mi_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        Q_FEAT_MUTUAL_INFO_ORACLE,
    )

    return Q_FEAT_MUTUAL_INFO_ORACLE


QUERIES["stream_mutual_info"] = QuerySpec(q_stream_mutual_info, _stream_mi_oracle())


def q_stream_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-monitored corpus mixing (r11) — the JS-divergence matrix
    kept fresh as documents land: a document's (source, term) counts are
    pure projections (decided at ARRIVAL), while every pairwise divergence
    is a function of the FINAL per-source distributions, so the whole
    matrix re-derives at READOUT from the SUM-folded count ledger
    (text_queries.js_divergence_from_counts — the identical tail the batch
    query runs). Shared oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        js_divergence_from_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_js_")
    src, led = f"{base}/src", f"{base}/counts"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text", "source").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # join-free: source rides the projection (the batch query's shape) —
        # re-attaching it by doc_id self-join cost a shuffle per micro-batch
        # (r11 review)
        from movie_genre_data_pipeline_spark.functions.text import alpha_tokens

        (
            batch_df.select("source", F.explode(alpha_tokens("text")).alias("term"))
            .groupBy("source", "term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .write.mode("append")
            .parquet(led)
        )

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    counts = (
        spark.read.parquet(led)
        .groupBy("source", "term")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    return js_divergence_from_counts(counts)


def _stream_js_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_JS_DIVERGENCE_ORACLE,
    )

    return Q_JS_DIVERGENCE_ORACLE


QUERIES["stream_js_divergence"] = QuerySpec(
    q_stream_js_divergence, _stream_js_oracle()
)


def q_stream_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous l-diversity audit (r11) — the attribute-disclosure twin of
    stream_k_anonymity: the (QI, sensitive) cell counts are pure SUM folds
    (decided at ARRIVAL), while the diversity verdict n_distinct < L is a
    READOUT re-judgment — a homogeneous early group usually diversifies as
    volume lands, so the risk report legitimately improves over time. Each
    micro-batch appends its cell partials (cdc_queries.l_diversity_cell_facts);
    the readout folds and runs the identical per-nation rollup
    (cdc_queries.l_diversity_from_cells). Shared oracle verbatim;
    split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.cdc_queries import (
        l_diversity_cell_facts,
        l_diversity_from_cells,
    )

    base = tempfile.mkdtemp(prefix="stream_ldiv_")
    src, led = f"{base}/src", f"{base}/cells"
    c = load(spark, sf_dir, "customer")
    c.select("c_nationkey", "c_mktsegment", "c_acctbal").repartition(
        _split(4)
    ).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        l_diversity_cell_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(led)
        .groupBy("c_nationkey", "bal_band", "c_mktsegment")
        .agg(F.sum("n_cell").cast("bigint").alias("n_cell"))
    )
    return l_diversity_from_cells(folded)


def _stream_ldiv_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.cdc_queries import (
        Q_L_DIVERSITY_ORACLE,
    )

    return Q_L_DIVERSITY_ORACLE


QUERIES["stream_l_diversity"] = QuerySpec(
    q_stream_l_diversity, _stream_ldiv_oracle()
)


def q_stream_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous t-closeness audit (r12) — the distribution-disclosure twin
    completing the streaming privacy family (k-anonymity r11, l-diversity
    r11): the (QI, band) cell counts are pure SUM folds (decided at
    ARRIVAL), while BOTH distributions the EMD compares — the group's and
    the GLOBAL one — are functions of the final folded ledger, so the whole
    distance is a READOUT re-derivation (a skewed early group converges
    toward the corpus distribution as volume lands; so does the corpus
    itself). Each micro-batch appends its cell partials
    (cdc_queries.t_closeness_cell_facts); the readout folds and runs the
    identical rollup (cdc_queries.t_closeness_from_cells). Shared oracle
    verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.cdc_queries import (
        t_closeness_cell_facts,
        t_closeness_from_cells,
    )

    base = tempfile.mkdtemp(prefix="stream_tclose_")
    src, led = f"{base}/src", f"{base}/cells"
    c = load(spark, sf_dir, "customer")
    c.select("c_nationkey", "c_mktsegment", "c_acctbal").repartition(
        _split(4)
    ).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        t_closeness_cell_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(led)
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.sum("n_cell").cast("bigint").alias("n_cell"))
    )
    return t_closeness_from_cells(folded)


def _stream_tclose_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.cdc_queries import (
        Q_T_CLOSENESS_ORACLE,
    )

    return Q_T_CLOSENESS_ORACLE


QUERIES["stream_t_closeness"] = QuerySpec(
    q_stream_t_closeness, _stream_tclose_oracle()
)


def q_stream_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous weighted sampling (r12) — the streaming half of the
    priority-sampling pair: top-k-by-priority is a MERGEABLE selection (any
    row in the global top-(k+1) is in its own batch's top-(k+1)), so the
    candidate ledger appends each micro-batch's per-stratum top-(k+1) and
    the readout re-ranks the union — while the true per-stratum totals the
    estimator is judged against are plain additive facts in a second ledger.
    Priorities are a pure function of doc_id (48-bit md5 fraction), so
    re-deriving them at readout is batching-invariant by construction.
    Shared oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.functions.sampling import (
        priority_sample,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        PRIORITY_EST_K,
        priority_estimator_report,
    )

    base = tempfile.mkdtemp(prefix="stream_prio_")
    src, cand_led, tot_led = f"{base}/src", f"{base}/cands", f"{base}/totals"
    d = load(spark, sf_dir, "documents")
    d.select("lang", "doc_id", "n_chars").repartition(_split(4)).write.parquet(
        src
    )

    schema = T.StructType(
        [
            T.StructField("lang", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        priority_sample(
            batch_df, "doc_id", "n_chars", PRIORITY_EST_K + 1, strata_col="lang"
        ).select("lang", "doc_id", "n_chars").write.mode("append").parquet(
            cand_led
        )
        batch_df.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        ).write.mode("append").parquet(tot_led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    totals = (
        spark.read.parquet(tot_led)
        .groupBy("lang")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_chars").cast("bigint").alias("total_chars"),
        )
    )
    return priority_estimator_report(spark.read.parquet(cand_led), totals)


def _stream_prio_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        Q_PRIORITY_ESTIMATOR_ORACLE,
    )

    return Q_PRIORITY_ESTIMATOR_ORACLE


QUERIES["stream_priority_sample"] = QuerySpec(
    q_stream_priority_sample, _stream_prio_oracle()
)


def q_stream_leakage_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous target-leakage screen (r12) — the per-feature MI report
    over a contingency ledger: the stacked (feature, x, y) cell counts are
    pure SUM folds (decided at ARRIVAL), while every marginal, entropy, and
    the nmi leakage dial are functions of the FINAL joint distributions, so
    the whole screen re-derives at READOUT (an early-window spurious
    correlation legitimately washes out as volume lands). Shared oracle
    verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        leakage_cell_facts,
        mutual_info_screen_from_cells,
    )

    base = tempfile.mkdtemp(prefix="stream_leak_")
    src, led = f"{base}/src", f"{base}/cells"
    o = load(spark, sf_dir, "orders")
    o.select(
        "o_orderpriority", "o_orderdate", "o_custkey", "o_totalprice",
        "o_orderstatus",
    ).repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderstatus", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        leakage_cell_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(led)
        .groupBy("feature", "x", "y")
        .agg(F.sum("n_xy").cast("bigint").alias("n_xy"))
    )
    return mutual_info_screen_from_cells(folded)


def _stream_leak_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _leakage_oracle,
    )

    return _leakage_oracle()


QUERIES["stream_leakage_screen"] = QuerySpec(
    q_stream_leakage_screen, _stream_leak_oracle()
)


def q_stream_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous WoE/IV feature pricing (r12) — the credit-scoring twin of
    stream_leakage_screen over the same contingency-ledger decomposition:
    per-bin (n_pos, n_neg) target counts are pure SUM folds (decided at
    ARRIVAL), while smoothing, every WoE log-ratio, the quantized shares,
    and the IV fold are functions of the FINAL distributions, so the whole
    report re-derives at READOUT. Shared oracle verbatim; split-invariance
    gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        woe_cell_facts,
        woe_iv_report_from_cells,
    )

    base = tempfile.mkdtemp(prefix="stream_woe_")
    src, led = f"{base}/src", f"{base}/cells"
    o = load(spark, sf_dir, "orders")
    o.select(
        "o_orderpriority", "o_orderdate", "o_custkey", "o_totalprice",
        "o_orderstatus",
    ).repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderstatus", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        woe_cell_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(led)
        .groupBy("feature", "x")
        .agg(
            F.sum("n_pos").cast("bigint").alias("n_pos"),
            F.sum("n_neg").cast("bigint").alias("n_neg"),
        )
    )
    return woe_iv_report_from_cells(folded)


def _stream_woe_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _woe_oracle,
    )

    return _woe_oracle()


QUERIES["stream_woe_iv"] = QuerySpec(q_stream_woe_iv, _stream_woe_oracle())


def q_stream_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous term-burstiness report (r12) — a TWO-ledger member: the
    per-term dispersion facts (df, Σx, Σx²) and the 1-row document count
    both SUM-fold (each document lives wholly in one micro-batch, so its
    within-doc counts — hence their squares — are batch-local facts), while
    the top-N rank cut and the Fano arithmetic re-derive at READOUT (a term
    can enter or leave the board as volume lands — the correct semantics
    for a monitoring surface). Shared oracle verbatim; split-invariance
    gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        burstiness_report_from_facts,
        burstiness_term_facts,
    )

    base = tempfile.mkdtemp(prefix="stream_burst_")
    src, led, dled = f"{base}/src", f"{base}/facts", f"{base}/docs"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        burstiness_term_facts(batch_df).write.mode("append").parquet(led)
        batch_df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs")
        ).write.mode("append").parquet(dled)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    facts = (
        spark.read.parquet(led)
        .groupBy("term")
        .agg(
            F.sum("df").cast("bigint").alias("df"),
            F.sum("sum_x").cast("bigint").alias("sum_x"),
            # the ledger partials land as DECIMAL(38,0); the fold stays there
            F.sum("sum_x2").cast("decimal(38,0)").alias("sum_x2"),
        )
    )
    n_docs = spark.read.parquet(dled).agg(
        F.sum("n_docs").cast("bigint").alias("n_docs")
    )
    return burstiness_report_from_facts(facts, n_docs)


def _stream_burst_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_BURSTINESS_ORACLE,
    )

    return Q_BURSTINESS_ORACLE


QUERIES["stream_burstiness"] = QuerySpec(
    q_stream_burstiness, _stream_burst_oracle()
)


def q_stream_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous autocorrelation ladder (r12) — the calendar-grain member
    of the additive family: per-batch hourly count partials SUM-fold
    (an event's hour is decided at ARRIVAL), while the dense spine, every
    lag pairing, the five moments, and r itself re-derive at READOUT —
    which is exactly why batching can't move the answer: the spine bounds
    come from the FOLDED series, and a zero-filled hour stays a real 0
    whichever micro-batch its neighbors arrived in. Shared oracle verbatim;
    split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        acf_report_from_counts,
        hourly_event_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_acf_")
    src, led = f"{base}/src", f"{base}/counts"
    ev = load(spark, sf_dir, "events")
    ev.select("ts", "event_id").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        hourly_event_counts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    counts = (
        spark.read.parquet(led)
        .groupBy("hour_id")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return acf_report_from_counts(counts)


def _stream_acf_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        Q_TS_ACF_ORACLE,
    )

    return Q_TS_ACF_ORACLE


QUERIES["stream_acf_lags"] = QuerySpec(q_stream_acf_lags, _stream_acf_oracle())


def q_stream_ess_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous effective-sample-size audit (r12) — the weighting-health
    dial maintained over a single additive ledger: each document's
    micro-quantized quality weight is a scan-local ARRIVAL decision, the
    per-language (n, Σw, Σw²) moments SUM-fold, and Kish's ESS re-derives at
    READOUT — so a stratum collapsing onto a few heavy documents is visible
    the moment it happens. Shared oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        ess_report_from_facts,
        quality_weight_facts,
    )

    base = tempfile.mkdtemp(prefix="stream_ess_")
    src, led = f"{base}/src", f"{base}/facts"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "lang", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        quality_weight_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(led)
        .groupBy("lang")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            # ledger partials land as DECIMAL(38,0); the fold stays there
            F.sum("sum_w").cast("decimal(38,0)").alias("sum_w"),
            F.sum("sum_w2").cast("decimal(38,0)").alias("sum_w2"),
        )
    )
    return ess_report_from_facts(folded)


def _stream_ess_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _ess_oracle,
    )

    return _ess_oracle()


QUERIES["stream_ess_report"] = QuerySpec(
    q_stream_ess_report, _stream_ess_oracle()
)


def q_stream_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous seasonal-index decomposition (r12) — the SAME hourly
    count ledger as stream_acf_lags with a different readout (the point of
    the ledger decomposition: one arrival-scoped fold, many derived
    reports): per-batch hourly partials SUM-fold, and the spine, the
    hour-of-day bucketing, and every index re-derive at READOUT. Shared
    oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        hourly_event_counts,
        seasonal_decompose_from_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_seasonal_")
    src, led = f"{base}/src", f"{base}/counts"
    ev = load(spark, sf_dir, "events")
    ev.select("ts", "event_id").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        hourly_event_counts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    counts = (
        spark.read.parquet(led)
        .groupBy("hour_id")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return seasonal_decompose_from_counts(counts)


def _stream_seasonal_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        Q_TS_SEASONAL_DECOMPOSE_ORACLE,
    )

    return Q_TS_SEASONAL_DECOMPOSE_ORACLE


QUERIES["stream_seasonal_decompose"] = QuerySpec(
    q_stream_seasonal_decompose, _stream_seasonal_oracle()
)


# GC threshold for the DSIR twins' postings/bucket ledgers: 2 shards keeps
# the compactor firing inside a 4-batch availableNow stream (one shard per
# batch), so every correctness run proves compact-then-append == append-only
# on the real ledgers. Production cadence is O(64) — write amplification per
# compaction is bounded by LIVE key cardinality either way, never by history.
DSIR_GC_MAX_FILES = 2


def _dsir_labeled_from_stream(
    spark: SparkSession, sf_dir: str, prefix: str
) -> DataFrame:
    """The shared front half of every DSIR-selector evaluation twin: stream
    documents through an availableNow pass that appends the three additive
    ledgers (doc dim carrying the label, term postings, bucket-model counts —
    the same triple stream_importance_weights folds), then fold them under
    the FINAL model into the (y, logw_micro) labeled frame. The honest
    streaming form: every document's score is re-judged under the folded
    model (the stream_surprisal_filter discipline — an early doc's score
    legitimately moves as the model learns), so any readout over this frame
    equals its batch twin bit-for-bit.

    Ledger GC cadence (VERDICT r13 #3): after each batch's appends the two
    heaviest ledgers (term postings, bucket-model counts — the ones whose
    shard count grows fastest at 100 TB arrival rates) run
    streaming/ledger.maybe_compact_ledger. Compaction is the readout's own
    SUM fold persisted, so it is EXACT under later appends (fold(compact(p)
    ∪ s) == fold(p ∪ s)) — the readout below is oblivious to whether GC
    fired. The threshold is sized so the GC path fires inside these twins'
    4-micro-batch availableNow streams (i.e. every driver correctness run
    exercises compact-then-append equality for real); a production
    deployment sizes it to O(64) shards — see maybe_compact_ledger's
    docstring for the trade."""
    from movie_genre_data_pipeline_spark.functions.sampling import (
        dsir_bucket_model,
        dsir_fold_scores,
        dsir_postings,
        dsir_term_buckets,
    )
    from movie_genre_data_pipeline_spark.streaming.ledger import (
        maybe_compact_ledger,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import DSIR_BUCKETS

    b = DSIR_BUCKETS
    base = tempfile.mkdtemp(prefix=prefix)
    src = f"{base}/src"
    led_doc, led_tf, led_bkt = f"{base}/docs", f"{base}/tf", f"{base}/buckets"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text", "lang", "source").repartition(_split(4)).write.parquet(
        src
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            "doc_id", "source", (F.col("lang") == "en").alias("y")
        ).write.mode("append").parquet(led_doc)
        terms = dsir_term_buckets(
            batch_df, "doc_id", "text", (F.col("lang") == "en"), b
        )
        dsir_postings(terms).write.mode("append").parquet(led_tf)
        dsir_bucket_model(terms).write.mode("append").parquet(led_bkt)
        spark = batch_df.sparkSession
        maybe_compact_ledger(
            spark, led_tf, ["doc_id", "bucket"], ["tf"], max_files=DSIR_GC_MAX_FILES
        )
        maybe_compact_ledger(
            spark, led_bkt, ["bucket"], ["raw_c", "tgt_c"], max_files=DSIR_GC_MAX_FILES
        )

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    buckets = (
        spark.read.parquet(led_bkt)
        .groupBy("bucket")
        .agg(F.sum("raw_c").alias("raw_c"), F.sum("tgt_c").alias("tgt_c"))
    )
    tf = (
        spark.read.parquet(led_tf)
        .groupBy("doc_id", "bucket")
        .agg(F.sum("tf").alias("tf"))
    )
    scored = dsir_fold_scores(tf, buckets, b).select("doc_id", "logw_micro")
    return (
        spark.read.parquet(led_doc)
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "y",
            F.coalesce("logw_micro", F.lit(0)).cast("bigint").alias("logw_micro"),
        )
    )


def q_stream_auc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained selector evaluation (r12): the exact
    Mann-Whitney AUC of the DSIR selector, re-derived at READOUT over the
    same additive ledger triple (see _dsir_labeled_from_stream). Shares the
    batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        auc_report_from_labeled,
    )

    return auc_report_from_labeled(
        _dsir_labeled_from_stream(spark, sf_dir, "stream_auc_")
    )


def _stream_auc_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import _auc_oracle

    return _auc_oracle()


QUERIES["stream_auc_report"] = QuerySpec(q_stream_auc_report, _stream_auc_oracle())


def q_stream_pr_auc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained average precision (r13): the PR-AUC of the
    DSIR selector — the imbalanced-regime companion to stream_auc_report —
    re-derived at READOUT over the same additive ledger triple (see
    _dsir_labeled_from_stream). Shares the batch oracle verbatim;
    split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        pr_auc_report_from_labeled,
    )

    return pr_auc_report_from_labeled(
        _dsir_labeled_from_stream(spark, sf_dir, "stream_pr_auc_")
    )


def _stream_pr_auc_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _pr_auc_oracle,
    )

    return _pr_auc_oracle()


QUERIES["stream_pr_auc_report"] = QuerySpec(
    q_stream_pr_auc_report, _stream_pr_auc_oracle()
)


def q_stream_ks_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained KS separation (r13): the third leg of the
    scorecard triple (AUC ranks, calibration prices confidence, KS localizes
    the best cutoff), re-derived at READOUT over the same additive ledger
    triple (see _dsir_labeled_from_stream). Shares the batch oracle verbatim;
    split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        ks_report_from_labeled,
    )

    return ks_report_from_labeled(
        _dsir_labeled_from_stream(spark, sf_dir, "stream_ks_")
    )


def _stream_ks_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import _ks_oracle

    return _ks_oracle()


QUERIES["stream_ks_report"] = QuerySpec(q_stream_ks_report, _stream_ks_oracle())


def q_stream_auc_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained AUC uncertainty (r13): the Poisson-bootstrap
    CI of the selector's AUC, re-derived at READOUT over the same additive
    ledger triple — the replicate weights are pure doc_id hashes (arrival
    decisions re-derivable at any time), so the band legitimately narrows
    as volume lands, the streaming form the Poisson bootstrap was built
    for. Shares the batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        auc_bootstrap_from_labeled,
    )

    return auc_bootstrap_from_labeled(
        _dsir_labeled_from_stream(spark, sf_dir, "stream_aucboot_")
    )


def _stream_auc_bootstrap_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _auc_bootstrap_oracle,
    )

    return _auc_bootstrap_oracle()


QUERIES["stream_auc_bootstrap_ci"] = QuerySpec(
    q_stream_auc_bootstrap_ci, _stream_auc_bootstrap_oracle()
)


def q_stream_auc_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained per-segment AUC (r13): the sliced selector
    evaluation re-derived at READOUT over the same additive ledger triple
    (the doc ledger carries the segment as an arrival fact). Shares the
    batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _AUC_MICRO,
        partitioned_mann_whitney_sums,
    )

    labeled = _dsir_labeled_from_stream(spark, sf_dir, "stream_auc_seg_")
    groups = labeled.groupBy("source", F.col("logw_micro").alias("s")).agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("c_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("bigint").alias("c_neg"),
    )
    sums = partitioned_mann_whitney_sums(groups, "source")
    return sums.selectExpr(
        "source",
        "n_pos",
        "n_neg",
        "n_scores",
        f"{_AUC_MICRO} AS auc_micro",
    ).selectExpr(
        "source",
        "n_pos",
        "n_neg",
        "n_scores",
        "auc_micro",
        "auc_micro * 2 - 1000000 AS gini_micro",
    )


def _stream_auc_by_segment_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _auc_by_segment_oracle,
    )

    return _auc_by_segment_oracle()


QUERIES["stream_auc_by_segment"] = QuerySpec(
    q_stream_auc_by_segment, _stream_auc_by_segment_oracle()
)


def q_stream_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained DP count release (r13): the true-count cell
    ledger SUM-folds per micro-batch, and the Laplace noise — a pure
    CELL-KEY hash through the inverse CDF — is re-drawn identically at
    every readout, so the always-current noisy marginal equals the batch
    release bit-for-bit (the arrival-independent-decision discipline the
    bootstrap weights use). Note this is the deterministic TEST-HARNESS
    noise (see ops_dp_release's caveat); the streaming shape itself — fold
    true counts, noise at readout — is exactly how a production continual-
    release mechanism bounds its state. Shares the batch oracle verbatim;
    split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.cdc_queries import (
        dp_marginal_facts,
        dp_release_from_facts,
    )

    base = tempfile.mkdtemp(prefix="stream_dp_")
    src, led = f"{base}/src", f"{base}/cells"
    c = load(spark, sf_dir, "customer")
    # pin the staged types to the declared stream schema (the fixture's
    # c_nationkey is int32; the file-source reader does not widen)
    c.select(
        F.col("c_custkey").cast("bigint"),
        F.col("c_nationkey").cast("bigint"),
        "c_mktsegment",
    ).repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_nationkey", T.LongType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        dp_marginal_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    facts = (
        spark.read.parquet(led)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    return dp_release_from_facts(facts)


def _stream_dp_release_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.cdc_queries import (
        Q_DP_RELEASE_ORACLE,
    )

    return Q_DP_RELEASE_ORACLE


QUERIES["stream_dp_release"] = QuerySpec(
    q_stream_dp_release, _stream_dp_release_oracle()
)


def q_stream_auc_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained leakage-free CV evaluation (r13): the
    leave-one-fold-out AUC re-derived at READOUT from three additive
    ledgers — doc labels, (fold, bucket) model cells, term postings. The
    fold is a pure doc_id hash (arrival decision re-derivable anywhere),
    the complement models are subtractions of the FOLDED global cells, and
    every doc re-scores under its fold's complement of the final model —
    so the continuous CV equals the batch CV bit-for-bit. Shares the batch
    oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.functions.sampling import (
        dsir_postings,
        dsir_term_buckets,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _CV_FOLD_SPARK,
        DSIR_BUCKETS,
        auc_cv_from_parts,
    )

    b = DSIR_BUCKETS
    base = tempfile.mkdtemp(prefix="stream_auc_cv_")
    src = f"{base}/src"
    led_doc, led_tf, led_cell = f"{base}/docs", f"{base}/tf", f"{base}/cells"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text", "lang").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            "doc_id", (F.col("lang") == "en").alias("y")
        ).write.mode("append").parquet(led_doc)
        terms = dsir_term_buckets(
            batch_df, "doc_id", "text", (F.col("lang") == "en"), b
        ).selectExpr("doc_id", "__tgt", "bucket", f"{_CV_FOLD_SPARK} AS fold")
        dsir_postings(terms).write.mode("append").parquet(led_tf)
        terms.groupBy("fold", "bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("raw_c"),
            F.sum(F.when(F.col("__tgt"), 1).otherwise(0))
            .cast("bigint")
            .alias("tgt_c"),
        ).write.mode("append").parquet(led_cell)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    docs = spark.read.parquet(led_doc).selectExpr(
        "doc_id", "y", f"{_CV_FOLD_SPARK} AS fold"
    )
    cells = (
        spark.read.parquet(led_cell)
        .groupBy("fold", "bucket")
        .agg(
            F.sum("raw_c").cast("bigint").alias("raw_c"),
            F.sum("tgt_c").cast("bigint").alias("tgt_c"),
        )
    )
    tf = (
        spark.read.parquet(led_tf)
        .groupBy("doc_id", "bucket")
        .agg(F.sum("tf").alias("tf"))
    )
    return auc_cv_from_parts(docs, cells, tf)


def _stream_auc_cv_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _auc_cv_oracle,
    )

    return _auc_cv_oracle()


QUERIES["stream_auc_cv"] = QuerySpec(q_stream_auc_cv, _stream_auc_cv_oracle())


def q_stream_score_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained score-drift monitoring (r13): the PSI of the
    DSIR score distribution (reference vs current snapshot halves),
    re-derived at READOUT over the same additive ledger triple — every
    document re-scores under the final folded model, the reference deciles
    re-rank, and both halves re-bin, so the continuous PSI equals the batch
    PSI bit-for-bit (the always-current form a nightly monitoring job
    folds from the ledgers instead of re-scanning the corpus). Shares the
    batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        score_psi_from_scored,
    )

    labeled = _dsir_labeled_from_stream(spark, sf_dir, "stream_psi_")
    scored = labeled.select(
        "doc_id",
        F.col("logw_micro").alias("s"),
        (F.col("doc_id") % 2 == 0).alias("is_ref"),
    )
    return score_psi_from_scored(scored)


def _stream_score_psi_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _score_psi_oracle,
    )

    return _score_psi_oracle()


QUERIES["stream_score_psi"] = QuerySpec(
    q_stream_score_psi, _stream_score_psi_oracle()
)


def q_stream_ledger_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ledger compaction/GC (r13 — VERDICT r12 #5): the streaming ledgers
    grow one shard per micro-batch FOREVER, so readout cost grows with
    batches-ever, not live state. This query exercises the fix end-to-end on
    real arrivals: a first availableNow pass appends per-batch hourly-count
    partials; streaming/ledger.compact_ledger folds the shard pile into ONE
    generation in place (stage-and-swap — readers never see a gap); a second
    pass over the SAME checkpoint appends the remaining arrivals; the readout
    folds compacted-prefix + fresh-suffix. Additivity makes the identity
    exact — fold(compact(prefix) ∪ suffix) == fold(prefix ∪ suffix) — and the
    published result IS that readout, so the shared batch oracle gates the
    fold-then-append == append-only equality on driver data, not just in the
    pytest (tests/test_ledger_compact.py proves the shard-count reduction and
    dtype preservation)."""
    from movie_genre_data_pipeline_spark.streaming.ledger import compact_ledger
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        hourly_event_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_ledgc_")
    src, led, ckpt = f"{base}/src", f"{base}/counts", f"{base}/ckpt"
    ev = load(spark, sf_dir, "events").select("ts", "event_id")

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )

    def run_pass() -> None:
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )

        def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
            hourly_event_counts(batch_df).write.mode("append").parquet(led)

        q = (
            stream.writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # first half of the feed arrives (even event ids), sharded into
    # micro-batches ...
    ev.filter(F.col("event_id") % 2 == 0).repartition(_split(2)).write.mode(
        "append"
    ).parquet(src)
    run_pass()
    # ... GC the shard pile mid-stream ...
    compact_ledger(spark, led, ["hour_id"], ["cnt"])
    # ... then the rest arrives and the SAME checkpoint processes only the
    # new files — appends land next to the compacted generation.
    ev.filter(F.col("event_id") % 2 == 1).repartition(_split(2)).write.mode(
        "append"
    ).parquet(src)
    run_pass()

    return (
        spark.read.parquet(led)
        .groupBy("hour_id")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def _stream_ledger_compact_oracle() -> str:
    return """
SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
         - CASE WHEN CAST(epoch_us(ts) AS BIGINT) % 3600000000 < 0
                THEN 1 ELSE 0 END AS hour_id,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM events GROUP BY 1
"""


QUERIES["stream_ledger_compact"] = QuerySpec(
    q_stream_ledger_compact, _stream_ledger_compact_oracle()
)


def q_stream_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained bootstrap uncertainty (r12): every document's
    32 Poisson replicate weights are pure doc_id hashes (ARRIVAL
    decisions), so the per-(language, replicate) weighted moments SUM-fold
    and the replicate means, order statistics, and CI all re-derive at
    READOUT — the uncertainty band legitimately narrows as volume lands.
    This is the streaming form Chamandy et al. built the Poisson bootstrap
    FOR (uncertainty over a stream without a global resample). Shared
    oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        bootstrap_ci_from_facts,
        bootstrap_replicate_facts,
    )

    base = tempfile.mkdtemp(prefix="stream_boot_")
    src, led = f"{base}/src", f"{base}/facts"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "lang", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        bootstrap_replicate_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    folded = (
        spark.read.parquet(led)
        .groupBy("lang", "r")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("sum_q").cast("decimal(38,0)").alias("sum_q"),
            F.sum("sum_k").cast("bigint").alias("sum_k"),
            F.sum("sum_kq").cast("decimal(38,0)").alias("sum_kq"),
        )
    )
    return bootstrap_ci_from_facts(folded)


def _stream_boot_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _bootstrap_oracle,
    )

    return _bootstrap_oracle()


QUERIES["stream_bootstrap_ci"] = QuerySpec(
    q_stream_bootstrap_ci, _stream_boot_oracle()
)


def q_stream_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained gains table (r13): the decile lift/cumulative-
    gains readout of the DSIR selector, re-derived at READOUT over the same
    additive ledger triple as the AUC family (see _dsir_labeled_from_stream)
    — every doc re-judged under the final folded model, then the ranged
    ntile + prefix-sum tail prices each top-k operating point. Shares the
    batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        lift_gains_from_labeled,
    )

    labeled = _dsir_labeled_from_stream(spark, sf_dir, "stream_lift_").select(
        "doc_id", "y", F.col("logw_micro").alias("s")
    )
    return lift_gains_from_labeled(labeled)


def _stream_lift_gains_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _lift_gains_oracle,
    )

    return _lift_gains_oracle()


QUERIES["stream_lift_gains"] = QuerySpec(
    q_stream_lift_gains, _stream_lift_gains_oracle()
)


def q_stream_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained revenue-concentration report (r13): per-batch
    per-customer cent partials append to a ledger (each order lands in
    exactly one micro-batch, so the per-customer totals SUM-fold — the
    simplest additive fact), and the Gini/top-share readout re-ranks the
    FOLDED totals (rank is a readout decision, never streamed state).
    Shares the batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.relational_extra import (
        gini_from_customer_cents,
    )

    base = tempfile.mkdtemp(prefix="stream_gini_")
    src, led = f"{base}/src", f"{base}/cents"
    o = load(spark, sf_dir, "orders")
    o.select(
        F.col("o_custkey").cast("bigint"),
        F.col("o_totalprice").cast("double"),
    ).repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.groupBy(F.col("o_custkey").alias("c")).agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        ).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    per_cust = (
        spark.read.parquet(led)
        .groupBy("c")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    return gini_from_customer_cents(per_cust)


def _stream_gini_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.relational_extra import (
        Q_GINI_ORACLE,
    )

    return Q_GINI_ORACLE


QUERIES["stream_gini_concentration"] = QuerySpec(
    q_stream_gini_concentration, _stream_gini_oracle()
)


def q_stream_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained trend test (r13): per-batch DAILY count
    partials SUM-fold (an event's day is decided at arrival — the ACF
    ladder's calendar-grain discipline one tier up), while the dense spine,
    the S fold, the tie correction, and the Theil-Sen slope median all
    re-derive at READOUT from the folded series. Shares the batch oracle
    verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        daily_event_counts,
        mann_kendall_from_counts,
    )

    base = tempfile.mkdtemp(prefix="stream_mk_")
    src, led = f"{base}/src", f"{base}/counts"
    ev = load(spark, sf_dir, "events")
    ev.select("ts", "event_id").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        daily_event_counts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    counts = (
        spark.read.parquet(led)
        .groupBy("day_id")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return mann_kendall_from_counts(counts)


def _stream_mk_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        Q_TS_MANN_KENDALL_ORACLE,
    )

    return Q_TS_MANN_KENDALL_ORACLE


QUERIES["stream_mann_kendall"] = QuerySpec(
    q_stream_mann_kendall, _stream_mk_oracle()
)


def q_stream_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained independence test (r13): (lang, source) cell
    partials SUM-fold per micro-batch (the stream_mutual_info ledger shape),
    while margins, the zero-filled grid, every χ² term, and Cramér's V all
    re-derive at READOUT from the folded contingency. Shares the batch
    oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        chi2_from_cells,
    )

    base = tempfile.mkdtemp(prefix="stream_chi2_")
    src, led = f"{base}/src", f"{base}/cells"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "lang", "source").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.groupBy(
            F.col("lang").alias("x"), F.col("source").alias("y")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n_xy")).write.mode(
            "append"
        ).parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    cells = (
        spark.read.parquet(led)
        .groupBy("x", "y")
        .agg(F.sum("n_xy").cast("bigint").alias("n_xy"))
    )
    return chi2_from_cells(cells)


def _stream_chi2_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        Q_FEAT_CHI2_ORACLE,
    )

    return Q_FEAT_CHI2_ORACLE


QUERIES["stream_chi2_independence"] = QuerySpec(
    q_stream_chi2_independence, _stream_chi2_oracle()
)


def q_stream_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained Neyman allocation (r13): per-batch per-language
    n_chars moment partials (n, Σx, Σx²) SUM-fold — the Gram-ledger shape —
    and the S_h quantization, the weights, and the whole largest-remainder
    apportionment re-derive at READOUT from the folded moments, so the
    always-current design equals the batch design bit-for-bit. Shares the
    batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        neyman_from_moments,
    )

    base = tempfile.mkdtemp(prefix="stream_neyman_")
    src, led = f"{base}/src", f"{base}/moments"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "lang", "n_chars").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("decimal(38,0)").alias("sx"),
            F.expr("SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars)").alias(
                "sxx"
            ),
        ).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    facts = (
        spark.read.parquet(led)
        .groupBy("lang")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("sx").cast("decimal(38,0)").alias("sx"),
            F.sum("sxx").cast("decimal(38,0)").alias("sxx"),
        )
    )
    return neyman_from_moments(facts)


def _stream_neyman_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        Q_NEYMAN_ORACLE,
    )

    return Q_NEYMAN_ORACLE


QUERIES["stream_neyman_allocation"] = QuerySpec(
    q_stream_neyman_allocation, _stream_neyman_oracle()
)


def q_stream_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained tail-index estimate (r13): per-doc length
    facts append to a ledger (doc_ids unique across batches — the
    stream_phash_dedup union-fold shape), and the top-k order statistics,
    the threshold, and the Hill fold all re-derive at READOUT over the
    folded lengths. Shares the batch oracle verbatim; split-invariance
    gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        hill_from_lengths,
    )

    base = tempfile.mkdtemp(prefix="stream_hill_")
    src, led = f"{base}/src", f"{base}/lengths"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "n_chars").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            "doc_id", F.col("n_chars").cast("bigint").alias("x")
        ).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    return hill_from_lengths(spark.read.parquet(led))


def _stream_hill_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import Q_HILL_ORACLE

    return Q_HILL_ORACLE


QUERIES["stream_hill_tail_index"] = QuerySpec(
    q_stream_hill_tail_index, _stream_hill_oracle()
)


def q_stream_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained SRM guardrail (r13): per-batch per-user event
    counts SUM-fold into the user grain (a user seen in many micro-batches
    folds to one row), and the arm assignment — a pure user_id hash — plus
    the χ² verdict re-derive at READOUT, so the always-current guardrail
    equals the batch check bit-for-bit. Shares the batch oracle verbatim;
    split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        srm_check_from_users,
    )

    base = tempfile.mkdtemp(prefix="stream_srm_")
    src, led = f"{base}/src", f"{base}/users"
    ev = load(spark, sf_dir, "events")
    ev.select("user_id", "event_id").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events")
        ).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    per_user = (
        spark.read.parquet(led)
        .groupBy("user_id")
        .agg(F.sum("n_events").cast("bigint").alias("n_events"))
    )
    return srm_check_from_users(per_user)


def _stream_srm_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        _srm_oracle,
    )

    return _srm_oracle()


QUERIES["stream_srm_check"] = QuerySpec(q_stream_srm_check, _stream_srm_oracle())


def q_stream_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained changepoint monitor (r13): the event log IS
    the ledger — per-batch (event_type, ts, event_id, v) facts append
    (event_ids unique across batches, a union fold), and the whole Page
    CUSUM trajectory, the per-series mean clearing, and the peak argmax
    re-derive at READOUT, so the always-current changepoint equals the
    batch answer bit-for-bit however arrivals were batched (an early
    point's deviation legitimately moves as later points shift the series
    mean — exactly why the statistic must be a readout, not streamed
    state). Shares the batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        cusum_from_base,
    )

    base_dir = tempfile.mkdtemp(prefix="stream_cusum_")
    src, led = f"{base_dir}/src", f"{base_dir}/facts"
    ev = load(spark, sf_dir, "events")
    ev.select("event_type", "ts", "event_id", "value").repartition(
        _split(4)
    ).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            "event_type",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("v"),
        ).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    return cusum_from_base(spark.read.parquet(led))


def _stream_cusum_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        Q_TS_CUSUM_ORACLE,
    )

    return Q_TS_CUSUM_ORACLE


QUERIES["stream_cusum_changepoint"] = QuerySpec(
    q_stream_cusum_changepoint, _stream_cusum_oracle()
)


def q_stream_readability_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained readability profile (r13): per-batch
    per-language ARI moments (n, Σari, n_hard) SUM-fold — per-doc ARI is a
    scan-local arrival decision, so the moments are the simplest additive
    ledger (the ESS shape) — and the means/shares re-derive at readout.
    Shares the batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        ari_facts,
        ari_report_from_facts,
    )

    base = tempfile.mkdtemp(prefix="stream_ari_")
    src, led = f"{base}/src", f"{base}/moments"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "lang", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        ari_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    facts = (
        spark.read.parquet(led)
        .groupBy("lang")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("sum_ari").cast("decimal(38,0)").alias("sum_ari"),
            F.sum("n_hard").cast("bigint").alias("n_hard"),
        )
    )
    return ari_report_from_facts(facts)


def _stream_ari_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import Q_ARI_ORACLE

    return Q_ARI_ORACLE


QUERIES["stream_readability_ari"] = QuerySpec(
    q_stream_readability_ari, _stream_ari_oracle()
)


def q_stream_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained encoding-sanity histogram (r13): per-batch
    byte-value cell partials from the Arrow bincount kernel SUM-fold (at
    most 256 cells per batch — the cheapest additive ledger in the suite),
    and the shares re-derive at readout over the folded counts. Shares the
    batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.functions.multimodal import (
        byte_histogram,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.multimodal_queries import (
        byte_histogram_report,
    )

    base = tempfile.mkdtemp(prefix="stream_bytehist_")
    src, led = f"{base}/src", f"{base}/cells"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        media = batch_df.select(
            F.col("doc_id").alias("media_id"),
            F.col("text").cast("binary").alias("payload"),
        )
        byte_histogram(media).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    counts = (
        spark.read.parquet(led)
        .groupBy("byte_value")
        .agg(F.sum("n_occurrences").cast("bigint").alias("n_occurrences"))
    )
    return byte_histogram_report(counts)


def _stream_bytehist_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.multimodal_queries import (
        Q_MEDIA_BYTE_HISTOGRAM_ORACLE,
    )

    return Q_MEDIA_BYTE_HISTOGRAM_ORACLE


QUERIES["stream_byte_histogram"] = QuerySpec(
    q_stream_byte_histogram, _stream_bytehist_oracle()
)


def q_stream_auc_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained data valuation (r13): the leave-one-source-out
    AUC ablation re-derived at READOUT from three additive ledgers — the doc
    dim (carrying source + label as arrival facts), the postings, and the
    PER-SOURCE bucket cells (the model ledger keyed one level finer, so any
    source's complement model is a subtraction of the fold). Shares the
    batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.functions.sampling import (
        dsir_postings,
        dsir_term_buckets,
    )
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        DSIR_BUCKETS,
        auc_source_ablation_from_parts,
    )

    b = DSIR_BUCKETS
    base = tempfile.mkdtemp(prefix="stream_ablation_")
    src = f"{base}/src"
    led_doc, led_tf, led_cells = f"{base}/docs", f"{base}/tf", f"{base}/cells"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text", "lang", "source").repartition(_split(4)).write.parquet(
        src
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.selectExpr(
            "doc_id", "lang = 'en' AS y", "source"
        ).write.mode("append").parquet(led_doc)
        terms = dsir_term_buckets(
            batch_df, "doc_id", "text", (F.col("lang") == "en"), b
        ).join(batch_df.select("doc_id", "source"), "doc_id")
        dsir_postings(terms.select("doc_id", "__tgt", "bucket")).write.mode(
            "append"
        ).parquet(led_tf)
        terms.groupBy("source", "bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("raw_c"),
            F.sum(F.when(F.col("__tgt"), 1).otherwise(0))
            .cast("bigint")
            .alias("tgt_c"),
        ).write.mode("append").parquet(led_cells)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    docs = spark.read.parquet(led_doc)
    cells = (
        spark.read.parquet(led_cells)
        .groupBy("source", "bucket")
        .agg(
            F.sum("raw_c").cast("bigint").alias("raw_c"),
            F.sum("tgt_c").cast("bigint").alias("tgt_c"),
        )
    )
    tf = (
        spark.read.parquet(led_tf)
        .groupBy("doc_id", "bucket")
        .agg(F.sum("tf").alias("tf"))
    )
    return auc_source_ablation_from_parts(docs, cells, tf)


def _stream_ablation_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _source_ablation_oracle,
    )

    return _source_ablation_oracle()


QUERIES["stream_auc_source_ablation"] = QuerySpec(
    q_stream_auc_source_ablation, _stream_ablation_oracle()
)


def q_stream_drift_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained per-feature drift sweep (r13): the stacked
    snapshot-contingency cells SUM-fold per micro-batch (snapshot membership
    is an arrival decision — an orderkey hash), and every feature's PSI
    re-derives at readout through the shared woe_iv_report_from_cells fold.
    Shares the batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        drift_cell_facts,
        drift_screen_from_cells,
    )

    base = tempfile.mkdtemp(prefix="stream_drift_scr_")
    src, led = f"{base}/src", f"{base}/cells"
    o = load(spark, sf_dir, "orders")
    o.select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate", "o_totalprice"
    ).repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        drift_cell_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    cells = (
        spark.read.parquet(led)
        .groupBy("feature", "x")
        .agg(
            F.sum("n_pos").cast("bigint").alias("n_pos"),
            F.sum("n_neg").cast("bigint").alias("n_neg"),
        )
    )
    return drift_screen_from_cells(cells)


def _stream_drift_screen_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        _drift_screen_oracle,
    )

    return _drift_screen_oracle()


QUERIES["stream_drift_screen"] = QuerySpec(
    q_stream_drift_screen, _stream_drift_screen_oracle()
)


def q_stream_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained graph mixing coefficient (r13) — the graph
    family's first ledger twin: per-batch DISTINCT (supplier, customer)
    edge partials append (a set-union fold — re-DISTINCTing the union
    recovers the corpus edge set exactly, the stream_phash discipline for
    pairs), and the degrees + the Pearson fold re-derive at READOUT, so
    the always-current assortativity equals the batch answer bit-for-bit.
    Shares the batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.graph_queries import (
        assortativity_from_edges,
    )

    base = tempfile.mkdtemp(prefix="stream_assort_")
    src, led = f"{base}/src", f"{base}/edges"
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    li.select("l_orderkey", "l_suppkey").join(
        o.select("o_orderkey", "o_custkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        F.col("l_suppkey").cast("bigint").alias("s"),
        F.col("o_custkey").cast("bigint").alias("c"),
    ).repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("s", T.LongType()),
            T.StructField("c", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select("s", "c").distinct().write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    edges = spark.read.parquet(led).distinct()
    return assortativity_from_edges(edges)


def _stream_assort_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.graph_queries import (
        _assortativity_oracle,
    )

    return _assortativity_oracle()


QUERIES["stream_degree_assortativity"] = QuerySpec(
    q_stream_degree_assortativity, _stream_assort_oracle()
)


def q_stream_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained PPS systematic design (r13): per-doc size
    facts union-fold (doc_ids unique across batches — the Hill ledger
    shape), and the total order, the prefix sums, the selection points,
    and every per-language count re-derive at READOUT — selection points
    move as the corpus grows, which is exactly why a systematic design
    must be a readout, not streamed state. Shares the batch oracle
    verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        pps_report_from_sizes,
    )

    base = tempfile.mkdtemp(prefix="stream_pps_")
    src, led = f"{base}/src", f"{base}/sizes"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "lang", "n_chars").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            "doc_id", "lang", F.col("n_chars").cast("bigint").alias("sz")
        ).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    return pps_report_from_sizes(spark.read.parquet(led))


def _stream_pps_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        Q_PPS_ORACLE,
    )

    return Q_PPS_ORACLE


QUERIES["stream_pps_systematic"] = QuerySpec(
    q_stream_pps_systematic, _stream_pps_oracle()
)


def q_stream_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained freshness SLA audit (r13): per-batch per-type
    MAX event-time partials append (the retention-policy horizon fold — MAX
    re-MAXes), and the horizon, every lag, and every breach verdict
    re-derive at readout over the folded facts. Shares the batch oracle
    verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.pipeline_queries import (
        freshness_facts,
        freshness_report_from_facts,
    )

    base = tempfile.mkdtemp(prefix="stream_fresh_")
    src, led = f"{base}/src", f"{base}/facts"
    ev = load(spark, sf_dir, "events")
    ev.select("event_type", "ts", "event_id").repartition(_split(4)).write.parquet(
        src
    )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        freshness_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    facts = (
        spark.read.parquet(led)
        .groupBy("event_type")
        .agg(F.max("last_us").cast("bigint").alias("last_us"))
    )
    return freshness_report_from_facts(facts)


def _stream_freshness_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.pipeline_queries import (
        Q_DQ_FRESHNESS_ORACLE,
    )

    return Q_DQ_FRESHNESS_ORACLE


QUERIES["stream_freshness_sla"] = QuerySpec(
    q_stream_freshness_sla, _stream_freshness_oracle()
)


# -- continuously-maintained Kaplan-Meier survival curve (r14) -----------------------------
def q_stream_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous KM retention monitoring: each micro-batch appends per-user
    span partials (user_id, MIN first-seen, MAX last-seen epoch micros — the
    two-monoid ledger: f_us folds by MIN, l_us by MAX, both re-associating),
    and EVERYTHING else — the corpus horizon, each user's death/censor
    verdict, durations, at-risk counts, the ln-domain cumulative product —
    re-derives at readout from the folded spans (a user's status legitimately
    flips from dead to alive when a later batch shows them active again, so
    the verdict can only be a readout decision). Shares the batch oracle
    verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        km_report_from_spans,
        km_user_spans,
    )

    base = tempfile.mkdtemp(prefix="stream_km_")
    src, led = f"{base}/src", f"{base}/spans"
    ev = load(spark, sf_dir, "events")
    ev.select("ts", "user_id").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        km_user_spans(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    spans = (
        spark.read.parquet(led)
        .groupBy("user_id")
        .agg(
            F.min("f_us").cast("bigint").alias("f_us"),
            F.max("l_us").cast("bigint").alias("l_us"),
        )
    )
    return km_report_from_spans(spans)


def _stream_km_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import Q_KM_ORACLE

    return Q_KM_ORACLE


QUERIES["stream_kaplan_meier"] = QuerySpec(q_stream_kaplan_meier, _stream_km_oracle())


# -- continuously-maintained Yule's K richness profile (r14) -------------------------------
def q_stream_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous vocabulary-richness monitoring: each micro-batch appends its
    (lang, term, tf) unigram postings (the Zipf/BM25 ledger shape — tf is the
    additive fact); N, the type count, Σtf², and K itself are all readout
    re-derivations over the SUM-folded postings (tf² doesn't re-associate, so
    squaring before the fold would be wrong — the fact is tf, the square is a
    readout decision). Shares the batch oracle verbatim; split-invariance
    gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        yule_postings,
        yule_report_from_postings,
    )

    base = tempfile.mkdtemp(prefix="stream_yule_")
    src, led = f"{base}/src", f"{base}/postings"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "lang", "text").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        yule_postings(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    postings = (
        spark.read.parquet(led)
        .groupBy("lang", "term")
        .agg(F.sum("tf").cast("bigint").alias("tf"))
    )
    return yule_report_from_postings(postings)


def _stream_yule_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import Q_YULE_ORACLE

    return Q_YULE_ORACLE


QUERIES["stream_yule_k"] = QuerySpec(q_stream_yule_k, _stream_yule_oracle())


# -- continuously-maintained Mahalanobis screen (r14) --------------------------------------
def q_stream_mahalanobis_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous joint-outlier monitoring: each micro-batch appends (a) its
    exact-integer feature dims and (b) its six-number moment partial (the
    OLS-Gram ledger shape — counts and DECIMAL(38,0) sums, pure SUM fold).
    Every d² is re-judged at readout under the FINAL folded covariance (an
    early order's verdict legitimately moves as the distribution fills in —
    the DSIR re-judging discipline), so the histogram equals the batch twin
    bit-for-bit. Shares the batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.sampling_queries import (
        maha_dims,
        maha_moments,
        maha_report_from_parts,
    )

    base = tempfile.mkdtemp(prefix="stream_maha_")
    src = f"{base}/src"
    led_dims, led_mom = f"{base}/dims", f"{base}/moments"
    o = load(spark, sf_dir, "orders")
    # the fixture's o_orderdate is a physical INT96 timestamp — pin DATE at
    # the staging write so the declared stream schema matches the footer
    o.select(
        "o_orderkey",
        "o_totalprice",
        F.to_date("o_orderdate").alias("o_orderdate"),
    ).repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.DateType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        dims = maha_dims(batch_df)
        dims.write.mode("append").parquet(led_dims)
        maha_moments(dims).write.mode("append").parquet(led_mom)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    moments = spark.read.parquet(led_mom).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s1").cast("bigint").alias("s1"),
        F.sum("s2").cast("bigint").alias("s2"),
        F.sum("p11").cast("decimal(38,0)").alias("p11"),
        F.sum("p12").cast("decimal(38,0)").alias("p12"),
        F.sum("p22").cast("decimal(38,0)").alias("p22"),
    )
    return maha_report_from_parts(spark.read.parquet(led_dims), moments)


def _stream_maha_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.sampling_queries import Q_MAHA_ORACLE

    return Q_MAHA_ORACLE


QUERIES["stream_mahalanobis_screen"] = QuerySpec(
    q_stream_mahalanobis_screen, _stream_maha_oracle()
)


# -- continuously-maintained Theil decomposition (r14) -------------------------------------
def q_stream_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous corpus-balance inequality monitoring: each micro-batch
    appends its per-source Theil facts (n, Σx, Σx·⌊ln x·1e6⌉ — the per-doc
    ln is an arrival decision, the x-weighted sum an exact DECIMAL fact), and
    T_g, the between terms, and every share re-derive at readout from the SUM
    fold. Shares the batch oracle verbatim; split-invariance gated."""
    from movie_genre_data_pipeline_spark.suite import load
    from movie_genre_data_pipeline_spark.suite.relational_extra import (
        theil_facts,
        theil_report_from_facts,
    )

    base = tempfile.mkdtemp(prefix="stream_theil_")
    src, led = f"{base}/src", f"{base}/facts"
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "source", "n_chars").repartition(_split(4)).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        theil_facts(batch_df).write.mode("append").parquet(led)

    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    facts = (
        spark.read.parquet(led)
        .groupBy("source")
        .agg(
            F.sum("n_g").cast("bigint").alias("n_g"),
            F.sum("x_g").cast("bigint").alias("x_g"),
            F.sum("l_g").cast("decimal(38,0)").alias("l_g"),
        )
    )
    return theil_report_from_facts(facts)


def _stream_theil_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.relational_extra import Q_THEIL_ORACLE

    return Q_THEIL_ORACLE


QUERIES["stream_theil_decomposition"] = QuerySpec(
    q_stream_theil_decomposition, _stream_theil_oracle()
)
