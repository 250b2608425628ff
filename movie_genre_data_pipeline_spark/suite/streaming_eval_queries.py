"""Continuous eval/privacy/statistics streaming twins (r11-r14 wave),
moved VERBATIM out of streaming_queries.py (r15, VERDICT r14 #6 -- the
5.8k-line module split). The DSIR-ledger AUC family, l-diversity,
t-closeness, WoE, burstiness, ACF, seasonal decompose, DP release,
ledger compaction, lift/gains, Gini, Mann-Kendall, chi-squared, Neyman,
Hill, SRM, CUSUM, ARI readability, byte histogram, source ablation,
drift screen, assortativity, PPS, freshness SLA, Kaplan-Meier, Yule's
K, Mahalanobis, and Theil.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from movie_genre_data_pipeline_spark.suite import QuerySpec
from movie_genre_data_pipeline_spark.suite.streaming_queries import (  # noqa: E501
    _split,
)

QUERIES: dict[str, QuerySpec] = {}

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
