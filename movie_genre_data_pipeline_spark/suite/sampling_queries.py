"""Deterministic sampling / splitting / packing queries over `documents`
(north star: reproducible training-data curation). Membership decisions are
md5-hash thresholds (functions/sampling.py), so the DuckDB oracle reproduces the
EXACT same sample — something seed-based `df.sample()` can never guarantee across
engines or even across repartitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.sampling import (
    assign_split,
    corpus_shuffle,
    hex_threshold,
    pack_token_budget,
    stratified_sample,
)
from movie_genre_data_pipeline_spark.functions.text import token_count
from movie_genre_data_pipeline_spark.suite import QuerySpec, load
from movie_genre_data_pipeline_spark.suite.text_queries import _TOKS

# per-language sampling rates: downsample dominant langs, keep the tail
_FRACTIONS = {"en": 0.5, "de": 0.8, "fr": 0.25, "es": 0.6, "zh": 1.0}
_SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))
_TOKEN_BUDGET = 2000


def q_sample_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsample by language, then train/val/test assignment —
    both decisions pure functions of doc_id (independent salts), aggregated to
    (lang, split) counts + token totals."""
    d = load(spark, sf_dir, "documents")
    sampled = stratified_sample(d, "doc_id", "lang", _FRACTIONS)
    labeled = sampled.withColumn("split", assign_split("doc_id", _SPLITS))
    return labeled.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("total_tokens"),
    )


def _stratified_split_oracle() -> str:
    keep = " OR ".join(
        f"(lang = '{lang}' AND md5(doc_id || ':sample') < '{hex_threshold(f)}')"
        for lang, f in _FRACTIONS.items()
    )
    t_train = hex_threshold(0.8)
    t_val = hex_threshold(0.9)
    return f"""
WITH sampled AS (
  SELECT doc_id, lang, {_TOKS} AS toks
  FROM documents
  WHERE {keep}
),
labeled AS (
  SELECT lang,
         CASE WHEN md5(doc_id || ':split') < '{t_train}' THEN 'train'
              WHEN md5(doc_id || ':split') < '{t_val}' THEN 'val'
              ELSE 'test' END AS split,
         CAST(len(toks) AS BIGINT) AS n_tokens
  FROM sampled
)
SELECT lang, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM labeled GROUP BY 1, 2
"""


def q_pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus sharding: per-language running token sum chops the doc sequence
    into ~2000-token training chunks; aggregated to per-chunk stats."""
    d = load(spark, sf_dir, "documents")
    packed = pack_token_budget(
        d, "doc_id", token_count("text"), "lang", _TOKEN_BUDGET
    )
    return packed.groupBy("lang", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
    )


Q_PACK_TOKEN_BUDGET_ORACLE = f"""
WITH t AS (
  SELECT lang, doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
),
c AS (
  SELECT lang, n_tokens,
         CAST(FLOOR(
           (SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) - n_tokens)
           / {float(_TOKEN_BUDGET)}
         ) AS BIGINT) AS chunk_id
  FROM t
)
SELECT lang, chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
FROM c GROUP BY 1, 2
"""


N_SHARDS = 8


def q_sample_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: every doc gets a (shard, pos)
    that is a pure function of doc_id — reproducible across engines, retries,
    and partitionings, unlike orderBy(rand())."""
    d = load(spark, sf_dir, "documents")
    return corpus_shuffle(d, "doc_id", N_SHARDS).select("doc_id", "shard", "pos")


Q_CORPUS_SHUFFLE_ORACLE = f"""
WITH tagged AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(doc_id || ':shuffle'), 1, 12)) AS BIGINT)
           % {N_SHARDS} AS shard,
         md5(doc_id || ':shuffle:order') AS ord
  FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord ASC, doc_id ASC)
            AS BIGINT) AS pos
FROM tagged
"""


RESERVOIR_K = 25


def q_sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted corpus subset: per language, keep the 25 docs with
    the highest priority n_chars/u (Duffield et al. priority sampling) — longer
    docs are proportionally likelier, yet the draw is a pure function of doc_id
    (u = 48-bit md5 fraction), so the oracle reproduces the exact sample AND
    the priority values bit-for-bit (single IEEE division, no pow/log)."""
    from movie_genre_data_pipeline_spark.functions.sampling import priority_sample

    d = load(spark, sf_dir, "documents")
    picked = priority_sample(
        d, "doc_id", "n_chars", RESERVOIR_K, strata_col="lang"
    )
    return picked.select("lang", "doc_id", "n_chars", "priority")


Q_WEIGHTED_RESERVOIR_ORACLE = f"""
WITH tagged AS (
  SELECT lang, doc_id, n_chars,
         CAST(n_chars AS DOUBLE) /
           ((CAST(concat('0x', substring(md5(doc_id || ':priority'), 1, 12))
                  AS BIGINT) + 1) / {float(1 << 48)!r}) AS priority
  FROM documents
)
SELECT lang, doc_id, n_chars, priority FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY lang ORDER BY priority DESC, doc_id ASC) AS rn
  FROM tagged
) t WHERE rn <= {RESERVOIR_K}
"""


QUERIES: dict[str, QuerySpec] = {
    "sample_stratified_split": QuerySpec(
        q_sample_stratified_split, _stratified_split_oracle()
    ),
    "sample_weighted_reservoir": QuerySpec(
        q_sample_weighted_reservoir, Q_WEIGHTED_RESERVOIR_ORACLE
    ),
    "pack_token_budget": QuerySpec(q_pack_token_budget, Q_PACK_TOKEN_BUDGET_ORACLE),
    "sample_corpus_shuffle": QuerySpec(
        q_sample_corpus_shuffle, Q_CORPUS_SHUFFLE_ORACLE
    ),
}


# -- temperature mixture sampling at alpha = 0.5 (r5) -----------------------------------
TEMP_TARGET = 300  # < corpus size so the α-rebalancing actually bites (en downsampled hardest)


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual rebalancing
    (functions/sampling.py:temperature_resample): shares ∝ √n_s lift
    low-resource languages relative to raw proportions — the mBERT/XLM-R
    mixing formula, exact at α = 0.5 because √ is correctly rounded and the
    normalizer folds in stratum-sorted order on both engines. The output
    reports observed vs target per language so the rebalancing effect is the
    checked value."""
    from movie_genre_data_pipeline_spark.functions.sampling import (
        temperature_resample,
    )

    d = load(spark, sf_dir, "documents")
    kept = temperature_resample(d, "doc_id", "lang", TEMP_TARGET, salt="temp5")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    kept_counts = kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )
    return counts.join(kept_counts, "lang", "left").select(
        "lang",
        "n_total",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
    )


Q_TEMPERATURE_MIXTURE_ORACLE = f"""
WITH counts AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
norm AS (
  SELECT list_aggregate(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang), 'sum') AS w
  FROM counts
),
rates AS (
  SELECT lang, n,
         LEAST(1.0, sqrt(CAST(n AS DOUBLE)) / w * {float(TEMP_TARGET)!r}
                    / CAST(n AS DOUBLE)) AS rate
  FROM counts, norm
),
kept AS (
  SELECT d.lang
  FROM documents d JOIN rates r USING (lang)
  WHERE CAST(concat('0x', substring(
          md5(concat(CAST(doc_id AS VARCHAR), ':temp5')), 1, 12)) AS BIGINT)
        / {float(1 << 48)!r} < r.rate
),
kc AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept FROM kept GROUP BY lang)
SELECT c.lang, c.n AS n_total, COALESCE(kc.n_kept, 0) AS n_kept
FROM counts c LEFT JOIN kc USING (lang)
"""


QUERIES["sample_temperature_mixture"] = QuerySpec(
    q_temperature_mixture, Q_TEMPERATURE_MIXTURE_ORACLE
)


FEAT_N_BINS = 10


def q_feat_equal_freq_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization (the feature-engineering prep step):
    NTILE bins per series over a TOTAL order (value, then id — ties must not
    leave bin assignment to the engine), reported as per-bin count + exact
    value span. Binning is per event_type, so the window parallelizes across
    series (the per-partition discipline; a production pipeline swaps NTILE
    for approx-quantile cutpoints when a single series outgrows one task).
    NTILE's remainder rule (first bins take the extra rows) is SQL-standard
    and identical in both engines, so bin membership is oracle-exact."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    binned = ev.withColumn("bin", F.ntile(FEAT_N_BINS).over(w))
    return binned.groupBy("event_type", "bin").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


Q_FEAT_EQUAL_FREQ_BINS_ORACLE = f"""
WITH binned AS (
  SELECT event_type, value,
         NTILE({FEAT_N_BINS}) OVER (PARTITION BY event_type
                                    ORDER BY value ASC, event_id ASC) AS bin
  FROM events
)
SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(MIN(value), 6) AS lo, ROUND(MAX(value), 6) AS hi
FROM binned GROUP BY event_type, bin
"""


QUERIES["feat_equal_freq_bins"] = QuerySpec(
    q_feat_equal_freq_bins, Q_FEAT_EQUAL_FREQ_BINS_ORACLE
)


# -- distributed model fitting: closed-form OLS via normal equations (r7) ---------------
def q_feat_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit totalprice_cents ~ 1 + runtime + genre_id over orders — the
    scaling-law / feature-weighting primitive (functions/regression.py): ONE
    map-side-combined aggregate reduces the fact table to the 3×3 integer
    Gram matrix + moment vector, and Cramer's rule solves on that single row
    as a projection. Integer inputs → exact BIGINT sums in any accumulation
    order; the determinant expressions are ONE shared string parsed by both
    engines, so the published micro-unit coefficients are bit-identical."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        ols_fit_micro,
    )

    o = load(spark, sf_dir, "orders")
    feats = o.select(
        (F.col("o_orderkey") % 180 + 60).cast("bigint").alias("x1"),
        (F.col("o_custkey") % 25).cast("bigint").alias("x2"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    return ols_fit_micro(feats, "x1", "x2", "y")


def _feat_ols_oracle() -> str:
    from movie_genre_data_pipeline_spark.functions.regression import (
        BETA_MICRO_SQL,
        GRAM_DOUBLE_COLS,
    )

    betas = ",\n       ".join(
        f"{expr} AS {name}" for name, expr in BETA_MICRO_SQL.items()
    )
    return f"""
WITH f AS (
  SELECT CAST(o_orderkey % 180 + 60 AS BIGINT) AS x1,
         CAST(o_custkey % 25 AS BIGINT) AS x2,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
), gi AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(x1) AS BIGINT) AS sx1,
         CAST(SUM(x2) AS BIGINT) AS sx2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(x2 * x2) AS BIGINT) AS s22,
         CAST(SUM(x1 * y) AS BIGINT) AS s1y,
         CAST(SUM(x2 * y) AS BIGINT) AS s2y
  FROM f
), g AS (
  SELECT n_rows, {", ".join(GRAM_DOUBLE_COLS)} FROM gi
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       {betas}
FROM g
"""


QUERIES["feat_ols_normal_eq"] = QuerySpec(q_feat_ols_normal_eq, _feat_ols_oracle())


# -- per-segment model fitting: grouped OLS (r7) ----------------------------------------
def q_feat_ols_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One independent OLS fit PER ORDER-PRIORITY SEGMENT — the "model per
    segment" shape (per-domain quality weights, per-language scaling laws):
    the same exact-integer Gram aggregate keyed by the segment column, ONE
    shuffle on the group key, d²·|segments| state, and the Cramer solve runs
    as a projection over every group row at once. At 100 TB this fits
    thousands of segment models in a single pass over the facts."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        ols_fit_micro,
    )

    o = load(spark, sf_dir, "orders")
    feats = o.select(
        F.col("o_orderpriority").alias("segment"),
        (F.col("o_orderkey") % 180 + 60).cast("bigint").alias("x1"),
        (F.col("o_custkey") % 25).cast("bigint").alias("x2"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    return ols_fit_micro(feats, "x1", "x2", "y", group_cols=("segment",))


def _feat_ols_segment_oracle() -> str:
    from movie_genre_data_pipeline_spark.functions.regression import (
        BETA_MICRO_SQL,
        GRAM_DOUBLE_COLS,
    )

    betas = ",\n       ".join(
        f"{expr} AS {name}" for name, expr in BETA_MICRO_SQL.items()
    )
    return f"""
WITH f AS (
  SELECT o_orderpriority AS segment,
         CAST(o_orderkey % 180 + 60 AS BIGINT) AS x1,
         CAST(o_custkey % 25 AS BIGINT) AS x2,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
), gi AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(x1) AS BIGINT) AS sx1,
         CAST(SUM(x2) AS BIGINT) AS sx2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(x2 * x2) AS BIGINT) AS s22,
         CAST(SUM(x1 * y) AS BIGINT) AS s1y,
         CAST(SUM(x2 * y) AS BIGINT) AS s2y
  FROM f GROUP BY segment
), g AS (
  SELECT segment, n_rows AS n_rows_i, {", ".join(GRAM_DOUBLE_COLS)} FROM gi
)
SELECT segment, CAST(n_rows_i AS BIGINT) AS n_rows,
       {betas}
FROM g
"""


QUERIES["feat_ols_by_segment"] = QuerySpec(
    q_feat_ols_by_segment, _feat_ols_segment_oracle()
)


# -- fit diagnostics: R² / RMSE from the same one-pass aggregate (r7) -------------------
def q_feat_ols_fit_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodness-of-fit for the orders model — R² and RMSE from the SAME
    single Gram aggregate as the fit (plus the exact Σy² second moment,
    carried in DECIMAL(38,0)/HUGEINT because squared cents exceed BIGINT):
    SSE = y'y − β'X'y is the normal-equations identity, evaluated on the
    shared-expression float solve so both engines produce identical doubles;
    published as integer micro-units / cents."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        ols_fit_quality,
    )

    o = load(spark, sf_dir, "orders")
    feats = o.select(
        (F.col("o_orderkey") % 180 + 60).cast("bigint").alias("x1"),
        (F.col("o_custkey") % 25).cast("bigint").alias("x2"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    return ols_fit_quality(feats, "x1", "x2", "y")


def _feat_ols_quality_oracle() -> str:
    from movie_genre_data_pipeline_spark.functions.regression import (
        FIT_QUALITY_SQL,
        GRAM_DOUBLE_COLS,
    )

    outs = ",\n       ".join(
        f"{expr} AS {name}" for name, expr in FIT_QUALITY_SQL.items()
    )
    return f"""
WITH f AS (
  SELECT CAST(o_orderkey % 180 + 60 AS BIGINT) AS x1,
         CAST(o_custkey % 25 AS BIGINT) AS x2,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
), gi AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(x1) AS BIGINT) AS sx1,
         CAST(SUM(x2) AS BIGINT) AS sx2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(x2 * x2) AS BIGINT) AS s22,
         CAST(SUM(x1 * y) AS BIGINT) AS s1y,
         CAST(SUM(x2 * y) AS BIGINT) AS s2y,
         SUM(CAST(y AS HUGEINT) * y) AS syy_h
  FROM f
), g AS (
  SELECT n_rows, {", ".join(GRAM_DOUBLE_COLS)},
         CAST(syy_h AS DOUBLE) AS syy
  FROM gi
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       {outs}
FROM g
"""


QUERIES["feat_ols_fit_quality"] = QuerySpec(
    q_feat_ols_fit_quality, _feat_ols_quality_oracle()
)


# -- regularization path: ridge from the same one-pass Gram (r7) ------------------------
# λ grid sized against the fixture's Gram scale (s11 ≈ n·x1² ≈ 3.4e8 at
# sf0.01): 0 reproduces OLS exactly, 1e6/1e8/1e10 sweep from negligible to
# dominating penalty, so the published path shows real shrinkage.
RIDGE_LAMBDAS = (0, 10**6, 10**8, 10**10)


def q_feat_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge path for totalprice_cents ~ 1 + x1 + x2 over orders
    (functions/regression.py:ridge_path_micro): ONE Gram scan, the λ grid
    explodes the one-row aggregate, and the shared Cramer expressions solve
    (XᵀX + λI')β = Xᵀy per λ as a projection. λ=0 is bit-identical to
    feat_ols_normal_eq; the shrinkage law |β(λ)| non-increasing is pinned in
    tests/test_regression.py."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        ridge_path_micro,
    )

    o = load(spark, sf_dir, "orders")
    feats = o.select(
        (F.col("o_orderkey") % 180 + 60).cast("bigint").alias("x1"),
        (F.col("o_custkey") % 25).cast("bigint").alias("x2"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    return ridge_path_micro(feats, "x1", "x2", "y", RIDGE_LAMBDAS)


def _feat_ridge_oracle() -> str:
    from movie_genre_data_pipeline_spark.functions.regression import (
        BETA_MICRO_SQL,
        GRAM_DOUBLE_COLS,
    )

    betas = ",\n       ".join(
        f"{expr} AS {name}" for name, expr in BETA_MICRO_SQL.items()
    )
    lam_rows = ", ".join(f"({l})" for l in RIDGE_LAMBDAS)
    return f"""
WITH f AS (
  SELECT CAST(o_orderkey % 180 + 60 AS BIGINT) AS x1,
         CAST(o_custkey % 25 AS BIGINT) AS x2,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
), gi AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(x1) AS BIGINT) AS sx1,
         CAST(SUM(x2) AS BIGINT) AS sx2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(x2 * x2) AS BIGINT) AS s22,
         CAST(SUM(x1 * y) AS BIGINT) AS s1y,
         CAST(SUM(x2 * y) AS BIGINT) AS s2y
  FROM f
), gp AS (
  SELECT CAST(lam.lam AS BIGINT) AS lam, n_rows, sx1, sx2, sy,
         CAST(s11 + lam.lam AS BIGINT) AS s11, s12,
         CAST(s22 + lam.lam AS BIGINT) AS s22, s1y, s2y
  FROM gi CROSS JOIN (VALUES {lam_rows}) AS lam(lam)
), g AS (
  SELECT lam, n_rows AS n_rows_i, {", ".join(GRAM_DOUBLE_COLS)} FROM gp
)
SELECT lam, CAST(n_rows_i AS BIGINT) AS n_rows,
       {betas}
FROM g
"""


QUERIES["feat_ridge_path"] = QuerySpec(q_feat_ridge_path, _feat_ridge_oracle())


# -- feature audit: all-pairs Pearson correlation in one pass (r7) ----------------------
_CORR_COLS = ("x1", "x2", "d", "y")


def q_feat_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations among four integer order features — the
    collinearity screen run before any fit (functions/regression.py:
    corr_matrix_micro): ONE map-side-combined aggregate produces the exact
    k + k(k+1)/2 moments (product moments in DECIMAL(38,0)/HUGEINT — integer
    cross-products overflow BIGINT at fact scale), and the 6 output rows
    unfold by a stack() projection. The correlation doubles come from shared
    fixed-order expressions over identical exact-integer-derived operands,
    published ×1e6 as integers per the portable-rounding rule."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        corr_matrix_micro,
    )

    o = load(spark, sf_dir, "orders")
    feats = o.select(
        (F.col("o_orderkey") % 180 + 60).cast("bigint").alias("x1"),
        (F.col("o_custkey") % 25).cast("bigint").alias("x2"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    return corr_matrix_micro(feats, _CORR_COLS)


def _feat_corr_oracle() -> str:
    from movie_genre_data_pipeline_spark.functions.regression import (
        corr_pair_sql,
    )

    cols = _CORR_COLS
    moments = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in cols:
        moments.append(f"CAST(SUM({c}) AS DOUBLE) AS s_{c}")
    for i, a in enumerate(cols):
        for b in cols[i:]:
            lo, hi = sorted((a, b))
            moments.append(
                f"CAST(SUM(CAST({a} AS HUGEINT) * {b}) AS DOUBLE) AS p_{lo}_{hi}"
            )
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    rows = "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, {corr_pair_sql(a, b)} AS corr_micro FROM g"
        for a, b in pairs
    )
    return f"""
WITH f AS (
  SELECT CAST(o_orderkey % 180 + 60 AS BIGINT) AS x1,
         CAST(o_custkey % 25 AS BIGINT) AS x2,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
), g AS (
  SELECT {", ".join(moments)} FROM f
)
{rows}
"""


QUERIES["feat_corr_matrix"] = QuerySpec(q_feat_corr_matrix, _feat_corr_oracle())


# -- leakage-safe splitting: assign by GROUP, not by row (r7) ----------------------------
def q_sample_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/val/test assignment — the leakage defense row-level
    splitting cannot give: the fold is a pure function of the CUSTOMER key,
    so every order of a customer lands in one fold and evaluation never sees
    a training customer's sibling rows (near-duplicate leakage). Same
    md5-threshold machinery as sample_stratified_split, keyed on the group;
    no-group-spans-folds is structural (a deterministic function of the key)
    and pinned in tests/test_sampling.py. Scale shape: the label is a scan-
    local projection on the fact table — no join, no shuffle before the
    summary aggregate."""
    from movie_genre_data_pipeline_spark.functions.sampling import assign_split

    o = load(spark, sf_dir, "orders")
    labeled = o.select(
        F.col("o_custkey"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        assign_split("o_custkey", _SPLITS),
    )
    return labeled.groupBy("split").agg(
        F.count_distinct("o_custkey").cast("bigint").alias("n_groups"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").alias("total_cents"),
    )


def _group_split_oracle() -> str:
    t_train = hex_threshold(0.8)
    t_val = hex_threshold(0.9)
    return f"""
WITH labeled AS (
  SELECT o_custkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN md5(o_custkey || ':split') < '{t_train}' THEN 'train'
              WHEN md5(o_custkey || ':split') < '{t_val}' THEN 'val'
              ELSE 'test' END AS split
  FROM orders
)
SELECT split,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_groups,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM labeled GROUP BY split
"""


QUERIES["sample_group_split"] = QuerySpec(q_sample_group_split, _group_split_oracle())


# -- target encoding with smoothing + leave-one-out (r7) --------------------------------
# The categorical-feature workhorse: encode a category as its smoothed target
# mean, enc = (Σy_cat + m·ȳ_global) / (n_cat + m) — and the leakage-aware
# leave-one-out form every training pipeline actually needs,
# enc_loo(i) = (Σy_cat − y_i) / (n_cat − 1), whose extremes this query
# publishes per category. Exactness: integer-cent sums, the global mean
# enters as the exact integer pair (Σy, n) so the smoothed numerator
# Σy_cat·n + m·Σy stays an exact BIGINT (no pre-divided double), and every
# published value is a shared-expression division micro-rounded to BIGINT.
# One aggregate over the facts + a broadcast one-row global — no second scan.
TE_SMOOTHING = 100


def q_feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("category"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    per_cat = base.groupBy("category").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cat"),
        F.sum("y").cast("bigint").alias("sum_cat"),
        F.min("y").cast("bigint").alias("y_min"),
        F.max("y").cast("bigint").alias("y_max"),
    )
    glob = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum("y").cast("bigint").alias("sum_all"),
    )
    joined = per_cat.crossJoin(F.broadcast(glob))
    # enc = (sum_cat + m·(sum_all/n_all)) / (n_cat + m), kept exact by
    # clearing the global denominator: (sum_cat·n_all + m·sum_all) /
    # ((n_cat + m)·n_all). LOO extremes come from the category extremes:
    # removing the largest y minimizes the LOO encoding and vice versa.
    return joined.selectExpr(
        "category",
        "n_cat",
        "sum_cat",
        f"CAST(ROUND((CAST(sum_cat AS DOUBLE) * n_all + {TE_SMOOTHING} * CAST(sum_all AS DOUBLE))"
        f" / ((n_cat + {TE_SMOOTHING}.0) * n_all) * 100) AS BIGINT) AS enc_centimicro",
        "CAST(ROUND((CAST(sum_cat AS DOUBLE) - y_max) / (n_cat - 1) * 100) AS BIGINT)"
        " AS loo_min_centicents",
        "CAST(ROUND((CAST(sum_cat AS DOUBLE) - y_min) / (n_cat - 1) * 100) AS BIGINT)"
        " AS loo_max_centicents",
    )


Q_FEAT_TARGET_ENCODE_ORACLE = f"""
WITH base AS (
  SELECT o_orderpriority AS category,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
),
per_cat AS (
  SELECT category,
         CAST(COUNT(*) AS BIGINT) AS n_cat,
         CAST(SUM(y) AS BIGINT) AS sum_cat,
         CAST(MIN(y) AS BIGINT) AS y_min,
         CAST(MAX(y) AS BIGINT) AS y_max
  FROM base GROUP BY category
),
gall AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(y) AS BIGINT) AS sum_all
  FROM base
)
SELECT category, n_cat, sum_cat,
       CAST(ROUND((CAST(sum_cat AS DOUBLE) * n_all + {TE_SMOOTHING} * CAST(sum_all AS DOUBLE))
            / ((n_cat + {TE_SMOOTHING}.0) * n_all) * 100) AS BIGINT) AS enc_centimicro,
       CAST(ROUND((CAST(sum_cat AS DOUBLE) - y_max) / (n_cat - 1) * 100) AS BIGINT)
         AS loo_min_centicents,
       CAST(ROUND((CAST(sum_cat AS DOUBLE) - y_min) / (n_cat - 1) * 100) AS BIGINT)
         AS loo_max_centicents
FROM per_cat CROSS JOIN gall
"""


QUERIES["feat_target_encode"] = QuerySpec(
    q_feat_target_encode, Q_FEAT_TARGET_ENCODE_ORACLE
)


# -- k-center greedy coreset (r8) -------------------------------------------------------
# Gonzalez's farthest-point traversal (the classic 2-approximation for metric
# k-center) as a training-data pruning operator: select KC_K maximally-spread
# exemplars from the embedding corpus — the seed selection step of coreset /
# diverse-subset pipelines (herding, k-center greedy active learning a la
# Sener & Savarese '18). Exact-integer discipline: vectors are quantized to
# integral doubles (functions/kmeans.py:quantize_vectors), every min-distance
# is an exact BIGINT-valued double, and ties break on vid — so DuckDB replays
# the greedy traversal decision-for-decision.
KC_K = 8


def q_sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KC_K rounds of: pick the point FARTHEST (max min-squared-L2, ties ->
    lower vid) from the already-picked set, starting from the lowest vid.
    Each round is ONE distributed linear scan — the incoming center travels
    as an O(d) literal (broadcast-sized), the running min-distance column is
    cached between rounds (a cluster deployment would checkpoint it), and
    only the 1-row arg-max is collected. Total cost KC_K*n*d with no shuffle
    wider than the 1-row TakeOrdered — the scale-correct shape, vs the
    O(n^2) pairwise spread matrix a naive implementation materializes.
    `radius` of row t is the covering radius of the first t-1 centers — the
    monotone certificate sequence the 2-approx guarantee is read from."""
    from movie_genre_data_pipeline_spark.functions.kmeans import (
        _sq_dist,
        quantize_vectors,
    )

    e = load(spark, sf_dir, "embeddings")
    q = quantize_vectors(e, "vec_id", "embedding")
    c0 = q.orderBy("vid").limit(1).collect()[0]
    picks = [(1, int(c0["vid"]), -1.0)]
    m = (
        q.filter(F.col("vid") != int(c0["vid"]))
        .select("vid", "vq", _sq_dist(F.col("vq"), list(c0["vq"])).alias("mind"))
        .cache()
    )
    frames = [m]
    for t in range(2, KC_K + 1):
        top = m.orderBy(F.col("mind").desc(), F.col("vid").asc()).limit(1).collect()[0]
        picks.append((t, int(top["vid"]), float(top["mind"])))
        if t < KC_K:
            m = (
                m.filter(F.col("vid") != int(top["vid"]))
                .select(
                    "vid",
                    "vq",
                    F.least(
                        F.col("mind"), _sq_dist(F.col("vq"), list(top["vq"]))
                    ).alias("mind"),
                )
                .cache()
            )
            frames.append(m)
    for f in frames:
        f.unpersist()
    return spark.createDataFrame(picks, "sel_rank int, center bigint, radius double")


def _kcenter_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.similarity_queries import (
        _PQ_EQ_CTE,
        _pq_sqd,
    )

    DIM = 64
    parts = [
        f"""WITH {_PQ_EQ_CTE},
k1 AS MATERIALIZED (SELECT vid, vq FROM eq ORDER BY vid LIMIT 1),
m1 AS MATERIALIZED (
  SELECT e.vid, e.vq, {_pq_sqd("e.vq", "c.vq", DIM)} AS mind
  FROM eq e CROSS JOIN k1 c WHERE e.vid <> c.vid
)"""
    ]
    for t in range(2, KC_K + 1):
        parts.append(
            f""",
k{t} AS MATERIALIZED (
  SELECT vid, vq, mind FROM m{t - 1} ORDER BY mind DESC, vid ASC LIMIT 1
)"""
        )
        if t < KC_K:
            parts.append(
                f""",
m{t} AS MATERIALIZED (
  SELECT m.vid, m.vq,
         LEAST(m.mind, {_pq_sqd("m.vq", "c.vq", DIM)}) AS mind
  FROM m{t - 1} m CROSS JOIN k{t} c WHERE m.vid <> c.vid
)"""
            )
    sel = [
        "SELECT CAST(1 AS INTEGER) AS sel_rank, vid AS center,"
        " CAST(-1 AS DOUBLE) AS radius FROM k1"
    ]
    for t in range(2, KC_K + 1):
        sel.append(
            f"SELECT CAST({t} AS INTEGER) AS sel_rank, vid AS center,"
            f" mind AS radius FROM k{t}"
        )
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


QUERIES["sample_kcenter_coreset"] = QuerySpec(
    q_sample_kcenter_coreset, _kcenter_oracle()
)


# -- DSIR importance selection (r8) ------------------------------------------------------
# Data Selection via Importance Resampling (Xie et al. 2023): score documents
# by a hashed-unigram target-vs-raw log-likelihood ratio and keep the ones
# that look more target-like than the corpus average. Target domain here =
# English documents (the stand-in for "high-quality reference corpus");
# selection is the deterministic logw > 0 rule so it stays a scan-local
# filter at 100 TB (no global sort, no Gumbel state).
DSIR_BUCKETS = 256


def q_sample_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source DSIR selection report: how many documents each source
    contributes to the selected (more-target-like-than-raw) pool, plus the
    mean log importance weight of the selected docs in nats. Output is
    source-dimension-sized regardless of corpus size. Exactness: per-doc
    log-weights are exact integer micro-nat sums (functions/sampling.py
    dsir_importance); the published mean divides two exact integers once."""
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance

    d = load(spark, sf_dir, "documents")
    w = dsir_importance(
        d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    )
    rep = (
        d.select("doc_id", "source")
        .join(w, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("logw_micro") > 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_selected"),
            F.sum(
                F.when(F.col("logw_micro") > 0, F.col("logw_micro")).otherwise(
                    F.lit(0)
                )
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


def _dsir_w_ctes() -> str:
    """The DSIR scoring chain as a WITH-body ending at w(doc_id, source,
    logw_micro) — shared by the selection report, the streaming fold's
    oracle, and the classifier-distillation oracle."""
    b = DSIR_BUCKETS
    return f"""terms AS (
  SELECT doc_id, lang = 'en' AS tgt,
         CAST(concat('0x', substring(md5(t.term), 1, 12)) AS BIGINT) % {b}
           AS bucket
  FROM (SELECT doc_id, lang, {_TOKS} AS toks FROM documents) d,
       unnest(toks) AS t(term)
),
tf AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM terms GROUP BY doc_id, bucket),
buckets AS (
  SELECT bucket, COUNT(*) AS raw_c,
         SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tgt_c
  FROM terms GROUP BY bucket
),
totals AS (SELECT SUM(raw_c) AS t_raw, SUM(tgt_c) AS t_tgt FROM buckets),
ratios AS (
  SELECT bucket,
         CAST(ROUND((LN((tgt_c + 1.0) / (t_tgt + CAST({b} AS DOUBLE)))
                   - LN((raw_c + 1.0) / (t_raw + CAST({b} AS DOUBLE))))
                    * 1000000.0, 0) AS BIGINT) AS lr_micro
  FROM buckets CROSS JOIN totals
),
scored AS (
  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         CAST(SUM(tf.tf * r.lr_micro) AS BIGINT) AS logw_micro
  FROM tf JOIN ratios r USING (bucket) GROUP BY tf.doc_id
),
w AS (
  SELECT d.doc_id, d.source,
         COALESCE(s.logw_micro, 0) AS logw_micro
  FROM documents d LEFT JOIN scored s USING (doc_id)
)"""


def _importance_select_oracle() -> str:
    return f"""
WITH {_dsir_w_ctes()}
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN logw_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_selected,
       ROUND(CAST(SUM(CASE WHEN logw_micro > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS sel_rate,
       CASE WHEN SUM(CASE WHEN logw_micro > 0 THEN 1 ELSE 0 END) > 0 THEN
         ROUND(CAST(SUM(CASE WHEN logw_micro > 0 THEN logw_micro ELSE 0 END)
                    AS DOUBLE)
               / 1000000.0
               / SUM(CASE WHEN logw_micro > 0 THEN 1 ELSE 0 END), 6)
       END AS avg_sel_logw
FROM w GROUP BY source
"""


QUERIES["sample_importance_select"] = QuerySpec(
    q_sample_importance_select, _importance_select_oracle()
)


# -- logistic quality classifier: IRLS parameter recovery (r8) ---------------------------
# The fit is graded against a KNOWN generating process: labels are drawn by
# the deterministic md5-uniform channel u < sigmoid(zt/1e6) with the true
# micro-betas below, so the published trajectory must CONVERGE TOWARD the
# injected truth — a parameter-recovery law, not just a hash match
# (tests/test_regression.py pins it).
LOGREG_TRUE = (-2_000_000, 30_000, -150_000)
LOGREG_ITERS = 4
_LOGREG_ZT = (
    f"{LOGREG_TRUE[0]} + {LOGREG_TRUE[1]} * x1 + {LOGREG_TRUE[2]} * x2"
)
_LOGREG_LABEL = (
    "CAST(CASE WHEN CAST(u48 AS DOUBLE) / 281474976710656.0"
    " < 1.0 / (1.0 + exp(-(CAST(zt AS DOUBLE) / 1000000.0)))"
    " THEN 1 ELSE 0 END AS BIGINT)"
)


def q_feat_logreg_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the 2-feature logistic quality classifier by LOGREG_ITERS IRLS
    steps (functions/regression.py logreg_irls_micro) on labels synthesized
    by the md5-uniform logistic channel, and publish the per-iteration
    trajectory (micro-betas + exact integer-score training accuracy). Every
    iteration is one d²-sized map-side-combined aggregate over the fact
    table — the OLS/ridge scan shape, so the fit costs iters·scan at any
    scale and shuffles only Gram-sized rows."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        logreg_irls_micro,
    )

    o = load(spark, sf_dir, "orders")
    feats = o.select(
        (F.col("o_orderkey") % 180 + 60).cast("bigint").alias("x1"),
        (F.col("o_custkey") % 25).cast("bigint").alias("x2"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":logreg"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("u48"),
    ).withColumn("zt", F.expr(_LOGREG_ZT))
    labeled = feats.select("x1", "x2", F.expr(_LOGREG_LABEL).alias("y"))
    return logreg_irls_micro(labeled, "x1", "x2", "y", iters=LOGREG_ITERS)


def _irls_ctes(iters: int, group: str | None = None) -> str:
    """The IRLS iteration chain as CTE text: expects upstream CTEs
    f(x1, x2, y[, group]) and b0(b0, b1, b2[, group]); emits s/g/d/b/a
    blocks per iteration — b{iters} holds the final micro-betas, a{iters}
    the final exact-integer accuracy. With `group`, every stage keys on it:
    one independent fit per group from the same scans. Shared by the
    recovery, distillation, and per-segment oracles."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        DELTA_MICRO12_SQL,
        LOGREG_R_SQL,
        LOGREG_W_SQL,
        SIGMOID_MICRO_SQL,
    )

    g = f"{group}, " if group else ""
    by = f" GROUP BY {group}" if group else ""
    join_b = (
        (lambda t: f"JOIN b{t} b USING ({group})")
        if group
        else (lambda t: f"CROSS JOIN b{t} b")
    )
    join_p = (
        (lambda t: f"JOIN b{t} p USING ({group})")
        if group
        else (lambda t: f"CROSS JOIN b{t} p")
    )
    parts = []
    for t in range(1, iters + 1):
        parts.append(
            f""",
s{t} AS MATERIALIZED (
  SELECT {g}x1, x2, y, {SIGMOID_MICRO_SQL} AS mu_micro
  FROM (SELECT f.*, b.b0 + b.b1 * x1 + b.b2 * x2 AS z_micro
        FROM f {join_b(t - 1)})
),
g{t} AS (
  SELECT {g}SUM(w) AS ni, SUM(w * x1) AS sx1i, SUM(w * x2) AS sx2i,
         SUM(r) AS syi, SUM(w * x1 * x1) AS s11i, SUM(w * x1 * x2) AS s12i,
         SUM(w * x2 * x2) AS s22i, SUM(x1 * r) AS s1yi, SUM(x2 * r) AS s2yi
  FROM (SELECT {g}x1, x2, {LOGREG_W_SQL} AS w, {LOGREG_R_SQL} AS r
        FROM s{t}){by}
),
d{t} AS (
  SELECT {g}CAST(ni AS DOUBLE) AS n, CAST(sx1i AS DOUBLE) AS sx1,
         CAST(sx2i AS DOUBLE) AS sx2, CAST(syi AS DOUBLE) AS sy,
         CAST(s11i AS DOUBLE) AS s11, CAST(s12i AS DOUBLE) AS s12,
         CAST(s22i AS DOUBLE) AS s22, CAST(s1yi AS DOUBLE) AS s1y,
         CAST(s2yi AS DOUBLE) AS s2y
  FROM g{t}
),
b{t} AS MATERIALIZED (
  SELECT {g}p.b0 + {DELTA_MICRO12_SQL["d0"]} AS b0,
         p.b1 + {DELTA_MICRO12_SQL["d1"]} AS b1,
         p.b2 + {DELTA_MICRO12_SQL["d2"]} AS b2
  FROM d{t} {join_p(t - 1)}
),
a{t} AS (
  SELECT {g}CAST(SUM(CASE WHEN (b.b0 + b.b1 * x1 + b.b2 * x2 > 0) = (y = 1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM f {join_b(t)}{by}
)"""
        )
    return "".join(parts)


def _logreg_oracle() -> str:
    parts = [
        f"""WITH f AS MATERIALIZED (
  SELECT x1, x2, {_LOGREG_LABEL} AS y
  FROM (
    SELECT x1, x2, u48, {_LOGREG_ZT} AS zt
    FROM (
      SELECT CAST(o_orderkey % 180 + 60 AS BIGINT) AS x1,
             CAST(o_custkey % 25 AS BIGINT) AS x2,
             CAST(concat('0x', substring(md5(o_orderkey || ':logreg'), 1, 12))
               AS BIGINT) AS u48
      FROM orders))
),
b0 AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1,
              CAST(0 AS BIGINT) AS b2)"""
    ]
    parts.append(_irls_ctes(LOGREG_ITERS))
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({t} AS INTEGER) AS iter, b0 AS b0_micro, b1 AS b1_micro,"
        f" b2 AS b2_micro, n_correct, n_rows FROM b{t} CROSS JOIN a{t}"
        for t in range(1, LOGREG_ITERS + 1)
    )
    return "".join(parts) + "\nSELECT * FROM (" + sel + ")"


QUERIES["feat_logreg_recovery"] = QuerySpec(q_feat_logreg_recovery, _logreg_oracle())


# -- classifier distillation: cheap-feature logistic fit on DSIR labels (r8) -------------
# The FineWeb/fastText workflow: the reference filter (here the DSIR
# importance rule) is expensive to evaluate in every downstream job, so
# distill it into a 2-feature logistic classifier and publish the final
# micro-betas plus the exact confusion matrix against the labels themselves.
DISTILL_ITERS = 3


def q_curate_classifier_distill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distill the DSIR selection rule into a logistic classifier over two
    cheap scan-local features (whitespace token count, English-stopword
    hits): labels are the DSIR logw > 0 decisions, training is DISTILL_ITERS
    IRLS steps (each ONE d²-sized map-side-combined aggregate), and the
    readout is a single row: final micro-betas + exact integer confusion
    counts (tp/fp/fn/tn) of the distilled rule against its teacher. The
    whole composition — teacher scoring, feature build, training, audit —
    stays oracle-exact."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        logreg_irls_micro,
    )
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance
    from movie_genre_data_pipeline_spark.functions.text import (
        LANG_LEXICONS,
        stopword_hits,
        token_count,
    )

    d = load(spark, sf_dir, "documents")
    w = dsir_importance(
        d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    )
    feats = (
        d.select(
            "doc_id",
            token_count("text").alias("x1"),
            stopword_hits("text", LANG_LEXICONS["en"]).alias("x2"),
        )
        .join(
            w.select(
                "doc_id",
                F.when(F.col("logw_micro") > 0, F.lit(1))
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("y"),
            ),
            "doc_id",
        )
        .select("x1", "x2", "y")
    )
    traj = logreg_irls_micro(feats, "x1", "x2", "y", iters=DISTILL_ITERS).collect()
    b = traj[-1]
    score = (
        F.lit(int(b["b0_micro"]))
        + F.lit(int(b["b1_micro"])) * F.col("x1")
        + F.lit(int(b["b2_micro"])) * F.col("x2")
    )
    pred = score > 0
    return feats.agg(
        F.sum(F.when(pred & (F.col("y") == 1), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(pred & (F.col("y") == 0), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(~pred & (F.col("y") == 1), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when(~pred & (F.col("y") == 0), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("tn"),
    ).select(
        F.lit(int(b["b0_micro"])).cast("bigint").alias("b0_micro"),
        F.lit(int(b["b1_micro"])).cast("bigint").alias("b1_micro"),
        F.lit(int(b["b2_micro"])).cast("bigint").alias("b2_micro"),
        "tp",
        "fp",
        "fn",
        "tn",
    )


def _distill_oracle() -> str:
    from movie_genre_data_pipeline_spark.functions.text import LANG_LEXICONS

    en = ", ".join(f"'{w}'" for w in LANG_LEXICONS["en"])
    T = DISTILL_ITERS
    return f"""
WITH {_dsir_w_ctes()},
f AS MATERIALIZED (
  SELECT CAST(len(toks) AS BIGINT) AS x1,
         CAST(len(list_filter(toks, t -> lower(t) IN ({en}))) AS BIGINT) AS x2,
         CAST(CASE WHEN logw_micro > 0 THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) dt
  JOIN w USING (doc_id)
),
b0 AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1,
              CAST(0 AS BIGINT) AS b2){_irls_ctes(T)}
SELECT b.b0 AS b0_micro, b.b1 AS b1_micro, b.b2 AS b2_micro,
       CAST(SUM(CASE WHEN b.b0 + b.b1 * x1 + b.b2 * x2 > 0 AND y = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN b.b0 + b.b1 * x1 + b.b2 * x2 > 0 AND y = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN NOT (b.b0 + b.b1 * x1 + b.b2 * x2 > 0) AND y = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN NOT (b.b0 + b.b1 * x1 + b.b2 * x2 > 0) AND y = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS tn
FROM f CROSS JOIN b{T} b
GROUP BY b.b0, b.b1, b.b2
"""


QUERIES["curate_classifier_distill"] = QuerySpec(
    q_curate_classifier_distill, _distill_oracle()
)


# -- end-to-end training-set assembly funnel (r8 capstone) -------------------------------
# The whole north-star pipeline in ONE oracled query: span-level dedup →
# heuristic quality filter → DSIR target-domain selection → deterministic
# train/val/test split → token-budget packing, published as a funnel
# manifest (one row per stage with surviving docs/tokens; the three split
# rows carry packed-chunk counts). Thresholds are chosen so every stage
# BINDS at every test SF (cuts some docs, keeps some) — both branches of
# each filter are oracle-exercised.
FUNNEL_DUP_MAX = 0.5
FUNNEL_QUALITY_MIN = 0.55
FUNNEL_DSIR_MIN_MICRO = -1_000_000
FUNNEL_BUDGET = 2000


def q_curate_trainset_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble a training set end-to-end and publish the funnel manifest:
    stage ranks 1-4 are raw → span-dedup (dup_fraction < 0.5) → quality
    (score ≥ 0.55) → DSIR (logw_micro > −1e6) with surviving doc/token
    counts; ranks 5-7 are the md5-deterministic train/val/test splits of the
    survivors with their 2000-token packed-chunk counts. Every stage is the
    already-proven operator (duplicate_spans, quality_score,
    dsir_importance, assign_split, pack_token_budget) composed — the report
    an actual data-curation run hands to the training team."""
    from movie_genre_data_pipeline_spark.functions.dedup import duplicate_spans
    from movie_genre_data_pipeline_spark.functions.sampling import (
        assign_split,
        dsir_importance,
        pack_token_budget,
    )
    from movie_genre_data_pipeline_spark.functions.text import quality_score

    d = load(spark, sf_dir, "documents")
    spans = duplicate_spans(d, "doc_id", "text", l=6).select(
        "doc_id", "n_tokens", "dup_fraction"
    )
    q = d.select("doc_id", quality_score("text").alias("quality"))
    w = dsir_importance(
        d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    ).select("doc_id", "logw_micro")
    scored = (
        d.select("doc_id")
        .join(spans, "doc_id")
        .join(q, "doc_id")
        .join(w, "doc_id")
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
                & (F.col("logw_micro") > F.lit(FUNNEL_DSIR_MIN_MICRO))
            ).alias("s4"),
        )
        # stage barrier (the curate_corpus_pipeline discipline): the scored
        # frame feeds BOTH the funnel aggregate and the split/pack branch,
        # and each scoring table re-scans the corpus to build — checkpoint
        # once so the final plan reads the 500-column-free scored rows, not
        # 16 parquet re-derivations (measured: 16 → 0 document scans in the
        # final plan)
        .localCheckpoint(eager=False)
    )
    return _funnel_report(scored)


def _funnel_report(scored: DataFrame) -> DataFrame:
    """The funnel readout over a scored frame (doc_id, n_tokens, s2, s3,
    s4): stage rows 1-4 from one conditional-sum pass, split rows 5-7 from
    the survivors via md5 split assignment + token packing. Shared by the
    batch funnel and its streaming-ledger form."""
    from movie_genre_data_pipeline_spark.functions.sampling import (
        assign_split,
        pack_token_budget,
    )

    one = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("d1"),
        F.sum("n_tokens").cast("bigint").alias("t1"),
        *[
            c
            for i in (2, 3, 4)
            for c in (
                F.sum(F.when(F.col(f"s{i}"), F.lit(1)).otherwise(F.lit(0)))
                .cast("bigint")
                .alias(f"d{i}"),
                F.sum(F.when(F.col(f"s{i}"), F.col("n_tokens")).otherwise(F.lit(0)))
                .cast("bigint")
                .alias(f"t{i}"),
            )
        ],
    )
    funnel = one.selectExpr(
        "stack(4, 1, 'raw', d1, t1, 2, 'span_dedup', d2, t2,"
        " 3, 'quality', d3, t3, 4, 'dsir', d4, t4)"
        " AS (stage_rank, stage, docs, tokens)"
    ).withColumn("chunks", F.lit(None).cast("bigint"))
    survivors = scored.filter("s4").select(
        "doc_id", "n_tokens", assign_split("doc_id", _SPLITS)
    )
    packed = pack_token_budget(
        survivors, "doc_id", F.col("n_tokens"), "split", FUNNEL_BUDGET
    )
    splits = (
        packed.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
            F.count_distinct("chunk_id").cast("bigint").alias("chunks"),
        )
        .select(
            F.when(F.col("split") == "train", F.lit(5))
            .when(F.col("split") == "val", F.lit(6))
            .otherwise(F.lit(7))
            .cast("int")
            .alias("stage_rank"),
            F.col("split").alias("stage"),
            "docs",
            "tokens",
            "chunks",
        )
    )
    return funnel.unionByName(splits)


def _trainset_funnel_oracle() -> str:
    from movie_genre_data_pipeline_spark.functions.sampling import hex_threshold
    from movie_genre_data_pipeline_spark.suite.dedup_queries import (
        _duplicate_spans_oracle,
    )
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_QUALITY_SCORES_ORACLE,
    )

    t_train, t_val = hex_threshold(0.8), hex_threshold(0.9)
    return f"""
WITH spanrep AS ({_duplicate_spans_oracle()}),
qual AS ({Q_QUALITY_SCORES_ORACLE}),
wdsir AS (WITH {_dsir_w_ctes()} SELECT doc_id, logw_micro FROM w),
scored AS (
  SELECT d.doc_id, s.n_tokens,
         s.dup_fraction < {FUNNEL_DUP_MAX} AS s2,
         s.dup_fraction < {FUNNEL_DUP_MAX}
           AND qual.quality >= {FUNNEL_QUALITY_MIN} AS s3,
         s.dup_fraction < {FUNNEL_DUP_MAX}
           AND qual.quality >= {FUNNEL_QUALITY_MIN}
           AND wd.logw_micro > {FUNNEL_DSIR_MIN_MICRO} AS s4
  FROM documents d
  JOIN spanrep s USING (doc_id)
  JOIN qual USING (doc_id)
  JOIN wdsir wd USING (doc_id)
),
splitrows AS (
  SELECT split,
         CAST(COUNT(*) AS BIGINT) AS docs,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens,
         CAST(COUNT(DISTINCT chunk_id) AS BIGINT) AS chunks
  FROM (
    SELECT split, n_tokens,
           CAST(FLOOR(
             (SUM(n_tokens) OVER (PARTITION BY split ORDER BY doc_id)
              - n_tokens) / {float(FUNNEL_BUDGET)}
           ) AS BIGINT) AS chunk_id
    FROM (
      SELECT doc_id, n_tokens,
             CASE WHEN md5(doc_id || ':split') < '{t_train}' THEN 'train'
                  WHEN md5(doc_id || ':split') < '{t_val}' THEN 'val'
                  ELSE 'test' END AS split
      FROM scored WHERE s4)
  ) GROUP BY split
)
SELECT CAST(1 AS INTEGER) AS stage_rank, 'raw' AS stage,
       CAST(COUNT(*) AS BIGINT) AS docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       CAST(NULL AS BIGINT) AS chunks
FROM scored
UNION ALL
SELECT 2, 'span_dedup',
       CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN s2 THEN n_tokens ELSE 0 END) AS BIGINT),
       CAST(NULL AS BIGINT)
FROM scored
UNION ALL
SELECT 3, 'quality',
       CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN s3 THEN n_tokens ELSE 0 END) AS BIGINT),
       CAST(NULL AS BIGINT)
FROM scored
UNION ALL
SELECT 4, 'dsir',
       CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN s4 THEN n_tokens ELSE 0 END) AS BIGINT),
       CAST(NULL AS BIGINT)
FROM scored
UNION ALL
SELECT CASE split WHEN 'train' THEN 5 WHEN 'val' THEN 6 ELSE 7 END,
       split, docs, tokens, chunks
FROM splitrows
"""


QUERIES["curate_trainset_funnel"] = QuerySpec(
    q_curate_trainset_funnel, _trainset_funnel_oracle()
)


# -- per-segment logistic fits with per-segment recovery (r8) ----------------------------
# Each order-priority segment draws labels from its OWN logistic channel
# (distinct true betas per segment), so the grouped trainer must recover a
# DIFFERENT parameter vector per group — the per-domain-classifier shape
# with the recovery law intact.
LOGREG_SEG_ITERS = 3
# si = first digit of o_orderpriority (1..5); truth varies linearly in si
_LOGREG_SEG_ZT = (
    "-2000000 + (20000 + 4000 * si) * x1 + (-(100000 + 20000 * si)) * x2"
)


def q_feat_logreg_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One logistic fit per order-priority segment, trained simultaneously
    by LOGREG_SEG_ITERS grouped IRLS steps (functions/regression.py:
    logreg_irls_grouped): the per-group beta table joins back broadcast each
    step, the weighted Gram keys on the segment (ONE shuffle, d²·|segments|
    state), and the solve projects over all group rows at once — no driver
    round-trips. Labels come from per-segment md5-uniform channels with
    DISTINCT injected truths, so each group's published betas must recover
    its own parameters (pinned in tests)."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        logreg_irls_grouped,
    )

    o = load(spark, sf_dir, "orders")
    feats = (
        o.select(
            F.col("o_orderpriority").alias("segment"),
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("si"),
            (F.col("o_orderkey") % 180 + 60).cast("bigint").alias("x1"),
            (F.col("o_custkey") % 25).cast("bigint").alias("x2"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("o_orderkey").cast("string"), F.lit(":logseg"))
                    ),
                    1,
                    12,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("u48"),
        )
        .withColumn("zt", F.expr(_LOGREG_SEG_ZT))
        .select("segment", "x1", "x2", F.expr(_LOGREG_LABEL).alias("y"))
    )
    return logreg_irls_grouped(
        feats, "segment", "x1", "x2", "y", iters=LOGREG_SEG_ITERS
    )


def _logreg_segment_oracle() -> str:
    return f"""
WITH f AS MATERIALIZED (
  SELECT segment, x1, x2, {_LOGREG_LABEL} AS y
  FROM (
    SELECT segment, x1, x2, u48, {_LOGREG_SEG_ZT} AS zt
    FROM (
      SELECT o_orderpriority AS segment,
             CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS si,
             CAST(o_orderkey % 180 + 60 AS BIGINT) AS x1,
             CAST(o_custkey % 25 AS BIGINT) AS x2,
             CAST(concat('0x', substring(md5(o_orderkey || ':logseg'), 1, 12))
               AS BIGINT) AS u48
      FROM orders))
),
b0 AS (SELECT DISTINCT segment, CAST(0 AS BIGINT) AS b0,
              CAST(0 AS BIGINT) AS b1, CAST(0 AS BIGINT) AS b2 FROM f)
{_irls_ctes(LOGREG_SEG_ITERS, group="segment")}
SELECT segment, b.b0 AS b0_micro, b.b1 AS b1_micro, b.b2 AS b2_micro,
       a.n_correct, a.n_rows
FROM b{LOGREG_SEG_ITERS} b JOIN a{LOGREG_SEG_ITERS} a USING (segment)
"""


QUERIES["feat_logreg_by_segment"] = QuerySpec(
    q_feat_logreg_by_segment, _logreg_segment_oracle()
)


# -- PCA top component by power iteration (r8) -------------------------------------------
PCA_ITERS = 8
_PCA_FEATS = [
    ("x1", "o_orderkey % 180 + 60"),
    ("x2", "o_custkey % 25"),
    ("x3", "o_orderkey % 97"),
    ("x4", "o_custkey % 53"),
]


def q_feat_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of four integer order features by power
    iteration (functions/regression.py:pca_power_top1): ONE map-side-
    combined moment pass reduces the facts to the 4×4 covariance, then all
    PCA_ITERS iterations are pure projections over that one row — no data
    re-scan per iteration at any corpus size (contrast gradient-descent PCA
    or iterative SVD, which re-scan per step). L∞ normalization (no sqrt)
    + per-iterate micro quantization keep the trajectory oracle-exact; the
    published row carries the sign-canonicalized eigenvector, the Rayleigh
    quotient, and the explained-variance ratio."""
    from movie_genre_data_pipeline_spark.functions.regression import pca_power_top1

    o = load(spark, sf_dir, "orders")
    feats = o.selectExpr(
        *[f"CAST({expr} AS BIGINT) AS {name}" for name, expr in _PCA_FEATS]
    )
    return pca_power_top1(feats, [n for n, _ in _PCA_FEATS], iters=PCA_ITERS)


def _pca_oracle() -> str:
    from movie_genre_data_pipeline_spark.functions.regression import (
        PCA_D,
        PCA_M_SQL,
        _pca_cov_sql,
        pca_u_sql,
    )

    d = PCA_D
    feats = ", ".join(f"CAST({expr} AS BIGINT) AS {name}" for name, expr in _PCA_FEATS)
    sums = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for i in range(1, d + 1):
        sums.append(f"SUM(x{i}) AS s{i}")
    for i in range(1, d + 1):
        for j in range(i, d + 1):
            sums.append(f"SUM(x{i} * x{j}) AS s{i}{j}")
    covs = ", ".join(
        f"{_pca_cov_sql(i, j)} AS c{i}{j}"
        for i in range(1, d + 1)
        for j in range(i, d + 1)
    )
    ccols = ", ".join(f"c{i}{j}" for i in range(1, d + 1) for j in range(i, d + 1))
    parts = [
        f"""WITH f AS (SELECT {feats} FROM orders),
g AS (SELECT {", ".join(sums)} FROM f),
c AS (SELECT {covs} FROM g),
p0 AS MATERIALIZED (SELECT c.*, {", ".join(f"CAST(1000000 AS BIGINT) AS v{i}" for i in range(1, d + 1))} FROM c)"""
    ]
    for t in range(1, PCA_ITERS + 1):
        us = ", ".join(f"{pca_u_sql(i)} AS u{i}" for i in range(1, d + 1))
        vs = ", ".join(
            f"CAST(ROUND(u{i} / m * 1000000.0, 0) AS BIGINT) AS v{i}"
            for i in range(1, d + 1)
        )
        parts.append(
            f""",
p{t} AS MATERIALIZED (
  SELECT {ccols}, {vs}
  FROM (SELECT p.*, {PCA_M_SQL} AS m
        FROM (SELECT p0x.*, {us} FROM p{t - 1} p0x) p)
)"""
        )
    ray_num = " + ".join(
        f"(CAST(v{i} AS DOUBLE) / 1000000.0) * c{min(i, j)}{max(i, j)} * (CAST(v{j} AS DOUBLE) / 1000000.0)"
        for i in range(1, d + 1)
        for j in range(1, d + 1)
    )
    ray_den = " + ".join(
        f"(CAST(v{i} AS DOUBLE) / 1000000.0) * (CAST(v{i} AS DOUBLE) / 1000000.0)" for i in range(1, d + 1)
    )
    trace = " + ".join(f"c{i}{i}" for i in range(1, d + 1))
    sign = (
        "CASE "
        + " ".join(
            f"WHEN ABS(v{i}) = 1000000 THEN (CASE WHEN v{i} > 0 THEN 1 ELSE -1 END)"
            for i in range(1, d + 1)
        )
        + " ELSE 1 END"
    )
    lam = f"(({ray_num}) / ({ray_den}))"
    sel = ", ".join(
        f"CAST(({sign}) * v{i} AS BIGINT) AS v{i}_micro" for i in range(1, d + 1)
    )
    parts.append(
        f"""
SELECT {sel},
       CAST(ROUND({lam} * 1000000.0, 0) AS BIGINT) AS lambda_micro,
       ROUND({lam} / ({trace}), 6) AS explained_ratio
FROM p{PCA_ITERS}"""
    )
    return "".join(parts)


QUERIES["feat_pca_power"] = QuerySpec(q_feat_pca_power, _pca_oracle())


def q_sample_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split audit run before trusting a train/val/test assignment:
    per-fold document counts and share, token-mass share, mean token count,
    and distinct-source coverage — the distribution-parity readout that
    catches a skewed or leaky split before training does. One scan-local
    split projection + one fold-keyed aggregate; the shares divide exact
    integer sums once."""
    from movie_genre_data_pipeline_spark.functions.sampling import assign_split
    from movie_genre_data_pipeline_spark.functions.text import token_count

    d = load(spark, sf_dir, "documents")
    labeled = d.select(
        "doc_id",
        "source",
        token_count("text").alias("n_tokens"),
        assign_split("doc_id", _SPLITS),
    )
    totals = labeled.agg(
        F.count(F.lit(1)).cast("bigint").alias("tot_docs"),
        F.sum("n_tokens").cast("bigint").alias("tot_tokens"),
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "split",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("tot_docs"), 6).alias(
                "doc_share"
            ),
            F.round(
                F.col("n_tokens").cast("double") / F.col("tot_tokens"), 6
            ).alias("token_share"),
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_docs"), 6
            ).alias("mean_tokens"),
            "n_sources",
        )
    )


def _split_audit_oracle() -> str:
    from movie_genre_data_pipeline_spark.functions.sampling import hex_threshold

    t_train, t_val = hex_threshold(0.8), hex_threshold(0.9)
    return f"""
WITH labeled AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         CASE WHEN md5(doc_id || ':split') < '{t_train}' THEN 'train'
              WHEN md5(doc_id || ':split') < '{t_val}' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS tot_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens
  FROM labeled
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(COUNT(*) AS DOUBLE) / tot_docs, 6) AS doc_share,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / tot_tokens, 6) AS token_share,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS mean_tokens,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM labeled CROSS JOIN totals
GROUP BY split, tot_docs, tot_tokens
"""


QUERIES["sample_split_audit"] = QuerySpec(q_sample_split_audit, _split_audit_oracle())


# -- second principal component by deflation (r9) ------------------------------------------
def q_feat_pca_deflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TWO principal components by power iteration + Hotelling deflation
    (functions/regression.py:pca_power_deflated) — the scree-plot / whitening
    prerequisite one component can't give. Same scale shape as
    feat_pca_power: ONE map-side-combined moment pass, then BOTH component
    loops are pure projections over the one-row covariance (deflation is
    C·v − λ1·w·(w·v)/(w·w), so the outer product never materializes and
    iteration count never multiplies corpus scans). Per-iterate micro quantization
    keeps the two-component trajectory bit-replayable in SQL."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        pca_moments,
        pca_power_deflated,
    )

    o = load(spark, sf_dir, "orders")
    feats = o.selectExpr(
        *[f"CAST({expr} AS BIGINT) AS {name}" for name, expr in _PCA_FEATS]
    )
    return pca_power_deflated(
        pca_moments(feats, [n for n, _ in _PCA_FEATS]), iters=PCA_ITERS
    )


def _pca_deflation_oracle() -> str:
    from movie_genre_data_pipeline_spark.functions.regression import (
        PCA_D,
        PCA_M2_SQL,
        PCA_M_SQL,
        PCA_V2_INIT,
        _pca_cov_sql,
        pca_ray_sql,
        pca_sign_sql,
        pca_u2_sql,
        pca_u_sql,
    )

    d = PCA_D
    feats = ", ".join(f"CAST({expr} AS BIGINT) AS {name}" for name, expr in _PCA_FEATS)
    sums = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for i in range(1, d + 1):
        sums.append(f"SUM(x{i}) AS s{i}")
    for i in range(1, d + 1):
        for j in range(i, d + 1):
            sums.append(f"SUM(x{i} * x{j}) AS s{i}{j}")
    covs = ", ".join(
        f"{_pca_cov_sql(i, j)} AS c{i}{j}"
        for i in range(1, d + 1)
        for j in range(i, d + 1)
    )
    ccols = ", ".join(f"c{i}{j}" for i in range(1, d + 1) for j in range(i, d + 1))
    parts = [
        f"""WITH f AS (SELECT {feats} FROM orders),
g AS (SELECT {", ".join(sums)} FROM f),
c AS (SELECT {covs} FROM g),
p0 AS MATERIALIZED (SELECT c.*, {", ".join(f"CAST(1000000 AS BIGINT) AS v{i}" for i in range(1, d + 1))} FROM c)"""
    ]
    for t in range(1, PCA_ITERS + 1):
        us = ", ".join(f"{pca_u_sql(i)} AS u{i}" for i in range(1, d + 1))
        vs = ", ".join(
            f"CAST(ROUND(u{i} / m * 1000000.0, 0) AS BIGINT) AS v{i}"
            for i in range(1, d + 1)
        )
        parts.append(
            f""",
p{t} AS MATERIALIZED (
  SELECT {ccols}, {vs}
  FROM (SELECT p.*, {PCA_M_SQL} AS m
        FROM (SELECT p0x.*, {us} FROM p{t - 1} p0x) p)
)"""
        )
    sgn1 = pca_sign_sql("v")
    canon_vs = ", ".join(
        f"CAST(({sgn1}) * v{i} AS BIGINT) AS v{i}" for i in range(1, d + 1)
    )
    parts.append(
        f""",
dfl AS MATERIALIZED (
  SELECT {ccols},
         {", ".join(f"v{i}" for i in range(1, d + 1))},
         {pca_ray_sql("v")} AS lam1,
         {", ".join(f"CAST(v{i} AS DOUBLE) / 1000000.0 AS w{i}" for i in range(1, d + 1))}
  FROM (SELECT {ccols}, {canon_vs} FROM p{PCA_ITERS})
),
q0 AS MATERIALIZED (
  SELECT dfl.*, {", ".join(f"CAST({PCA_V2_INIT[i - 1]} AS BIGINT) AS v2{i}" for i in range(1, d + 1))}
  FROM dfl
)"""
    )
    carry = (
        ccols
        + ", "
        + ", ".join(f"v{i}" for i in range(1, d + 1))
        + ", lam1, "
        + ", ".join(f"w{i}" for i in range(1, d + 1))
    )
    for t in range(1, PCA_ITERS + 1):
        u2s = ", ".join(f"{pca_u2_sql(i)} AS u2{i}" for i in range(1, d + 1))
        v2s = ", ".join(
            f"CAST(ROUND(u2{i} / m2 * 1000000.0, 0) AS BIGINT) AS v2{i}"
            for i in range(1, d + 1)
        )
        parts.append(
            f""",
q{t} AS MATERIALIZED (
  SELECT {carry}, {v2s}
  FROM (SELECT q.*, {PCA_M2_SQL} AS m2
        FROM (SELECT q0x.*, {u2s} FROM q{t - 1} q0x) q)
)"""
        )
    sgn2 = pca_sign_sql("v2")
    lam2 = pca_ray_sql("v2")
    trace = " + ".join(f"c{i}{i}" for i in range(1, d + 1))
    parts.append(
        f"""
SELECT {", ".join(f"CAST(v{i} AS BIGINT) AS v{i}_micro" for i in range(1, d + 1))},
       CAST(ROUND(lam1 * 1000000.0, 0) AS BIGINT) AS lambda1_micro,
       {", ".join(f"CAST(({sgn2}) * v2{i} AS BIGINT) AS v2{i}_micro" for i in range(1, d + 1))},
       CAST(ROUND({lam2} * 1000000.0, 0) AS BIGINT) AS lambda2_micro,
       ROUND(lam1 / ({trace}), 6) AS explained1_ratio,
       ROUND({lam2} / ({trace}), 6) AS explained2_ratio
FROM q{PCA_ITERS}"""
    )
    return "".join(parts)


QUERIES["feat_pca_deflation"] = QuerySpec(q_feat_pca_deflation, _pca_deflation_oracle())


# -- packing efficiency audit (r9) -----------------------------------------------------------
def pack_efficiency_from_counts(t: DataFrame) -> DataFrame:
    """The count-table form of the packing audit (r10): `t` is
    (lang, doc_id, n_tokens) per-document token counts — additive FACTS,
    however accumulated (one batch scan or a streaming append ledger folded
    by SUM). The packer's chunk assignment is a READOUT decision (a doc's
    chunk depends on the running total of every lower-id doc in its
    language), so the whole tail — pack window, chunk aggregate, audit
    aggregate — derives here, shared verbatim by q_sample_pack_efficiency
    and its streaming twin."""
    from movie_genre_data_pipeline_spark.functions.sampling import (
        pack_token_budget,
    )

    packed = pack_token_budget(
        t, "doc_id", F.col("n_tokens"), "lang", _TOKEN_BUDGET
    )
    chunks = packed.groupBy("lang", "chunk_id").agg(
        F.sum("n_tokens").cast("bigint").alias("chunk_tokens")
    )
    return chunks.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("chunk_tokens").cast("bigint").alias("total_tokens"),
        F.min("chunk_tokens").cast("bigint").alias("min_chunk"),
        F.max("chunk_tokens").cast("bigint").alias("max_chunk"),
        F.sum(F.when(F.col("chunk_tokens") > _TOKEN_BUDGET, 1).otherwise(0))
        .cast("bigint")
        .alias("n_overfull"),
        F.expr(
            "CAST(ROUND(CAST(SUM(chunk_tokens) AS DOUBLE)"
            f" / (CAST(COUNT(*) AS DOUBLE) * CAST({_TOKEN_BUDGET} AS DOUBLE))"
            " * CAST(1000000 AS DOUBLE)) AS BIGINT)"
        ).alias("fill_micro"),
    )


def q_sample_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit run after token-budget packing and before training: per
    language, chunk count, fill statistics, over-budget chunks (a single
    doc larger than the budget overfills its chunk — the packer's documented
    behavior, counted here instead of hidden), and the fill ratio against
    the ideal n_chunks·budget capacity. Same split_audit discipline: trust
    the sharding only after its distribution is published. One window (the
    packer's own) + one lang-keyed aggregate; all integers + one micro."""
    from movie_genre_data_pipeline_spark.functions.text import token_count

    d = load(spark, sf_dir, "documents")
    return pack_efficiency_from_counts(
        d.select("lang", "doc_id", token_count("text").alias("n_tokens"))
    )


Q_SAMPLE_PACK_EFFICIENCY_ORACLE = f"""
WITH t AS (
  SELECT lang, doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
),
c AS (
  SELECT lang, n_tokens,
         CAST(FLOOR(
           (SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) - n_tokens)
           / {float(_TOKEN_BUDGET)}
         ) AS BIGINT) AS chunk_id
  FROM t
),
chunks AS (
  SELECT lang, chunk_id, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
  FROM c GROUP BY 1, 2
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(chunk_tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(chunk_tokens) AS BIGINT) AS min_chunk,
       CAST(MAX(chunk_tokens) AS BIGINT) AS max_chunk,
       CAST(SUM(CASE WHEN chunk_tokens > {_TOKEN_BUDGET} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overfull,
       CAST(ROUND(CAST(SUM(chunk_tokens) AS DOUBLE)
            / (CAST(COUNT(*) AS DOUBLE) * CAST({_TOKEN_BUDGET} AS DOUBLE))
            * CAST(1000000 AS DOUBLE)) AS BIGINT) AS fill_micro
FROM chunks GROUP BY lang
"""

QUERIES["sample_pack_efficiency"] = QuerySpec(
    q_sample_pack_efficiency, Q_SAMPLE_PACK_EFFICIENCY_ORACLE
)


# -- mutual information between categorical features (r11) ------------------------------------
# The information-theoretic member of the feature-relevance family (next to
# Pearson corr and target encoding): MI(X;Y) = Σ p_xy · ln(p_xy / (p_x p_y))
# over the contingency table — the standard feature-selection statistic for
# categorical pairs. Exactness discipline: each cell's log-ratio argument is
# the EXACT integer ratio N·n_xy / (n_x·n_y); its ln is quantized to
# micro-nats with the FLOOR(x+0.5) half-up spell (the argument can be < 1,
# so the negative-half ROUND divergence is live here), weighted by the
# integer cell count, summed exactly in BIGINT, and divided by N once.
# Marginal entropies publish alongside (same per-term quantization as
# text_unigram_entropy) so normalized MI is one derived division away.
# Scale shape: one |X|·|Y|-cell hash aggregate + two broadcast marginals —
# nothing row-sized past the first groupBy. numpy law test in
# tests/test_engine_parity.py.
# each factor cast to DOUBLE BEFORE the multiply: n_rows*n_xy in BIGINT
# overflows 2^63 near 1.5e11 rows with a dominant cell (ANSI mode kills the
# job; non-ANSI wraps negative and ln() silently drops cells) — the r11
# review's point; the denominator already used this pattern
_MI_CELL = (
    "CAST(FLOOR(ln(CAST(n_rows AS DOUBLE) * CAST(n_xy AS DOUBLE)"
    " / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))"
    " * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
# weighted log-sums accumulate in DECIMAL(38,0): a single term is
# ~ln(c)*1e6*c ~ 3e19 at trillion-row marginals, past BIGINT (the Simpson
# sum two modules over demonstrates the same fix)
_H_TERM = (
    "SUM(CAST(CAST(ROUND(ln(CAST({n} AS DOUBLE))"
    " * CAST(1000000 AS DOUBLE)) AS BIGINT) AS DECIMAL(38,0)) * {n})"
)


def mutual_info_from_cells(cells: DataFrame) -> DataFrame:
    """The count-table form of the MI report: `cells` is (x, y, n_xy) — the
    ADDITIVE contingency facts, however accumulated (one batch scan or a
    streaming ledger folded by SUM). Marginals, totals, the per-cell
    log-ratio quantization, and both entropies all derive here; shared by
    the batch query and its streaming twin."""
    # cells feeds FIVE consumers (both marginals, the total, the joined
    # frame, and — through the marginals — both entropy sums): one barrier
    # or the fact scan + cell aggregate re-run per consumer (plan audit: 6
    # orders scans without it)
    cells = cells.localCheckpoint(eager=False)
    mx = cells.groupBy("x").agg(F.sum("n_xy").cast("bigint").alias("n_x"))
    my = cells.groupBy("y").agg(F.sum("n_xy").cast("bigint").alias("n_y"))
    tot = cells.agg(F.sum("n_xy").cast("bigint").alias("n_rows"))
    joined = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )
    sums = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("n_rows").cast("bigint").alias("n_rows"),
        F.expr(
            f"SUM(CAST({_MI_CELL} AS DECIMAL(38,0)) * n_xy)"
        ).alias("smi"),
    )
    hx = mx.agg(F.expr(_H_TERM.format(n="n_x")).alias("sx"))
    hy = my.agg(F.expr(_H_TERM.format(n="n_y")).alias("sy"))
    ent = (
        "CAST(ROUND(ln(CAST(n_rows AS DOUBLE)) * CAST(1000000 AS DOUBLE))"
        " AS BIGINT)"
        " - CAST(FLOOR(CAST({s} AS DOUBLE) / CAST(n_rows AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    return (
        sums.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .selectExpr(
            "n_cells",
            "n_rows",
            "CAST(FLOOR(CAST(smi AS DOUBLE) / CAST(n_rows AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mi_micro",
            ent.format(s="sx") + " AS h_x_micro",
            ent.format(s="sy") + " AS h_y_micro",
        )
    )


def q_feat_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
    return mutual_info_from_cells(cells)


Q_FEAT_MUTUAL_INFO_ORACLE = f"""
WITH cells AS (
  SELECT o_orderpriority AS x, o_orderstatus AS y,
         CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM orders GROUP BY 1, 2
),
mx AS (SELECT x, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY x),
my AS (SELECT y, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY y),
tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_rows FROM cells),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         MAX(n_rows) AS n_rows,
         SUM(CAST({_MI_CELL} AS DECIMAL(38,0)) * n_xy) AS smi
  FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
),
hx AS (SELECT {_H_TERM.format(n="n_x")} AS sx FROM mx),
hy AS (SELECT {_H_TERM.format(n="n_y")} AS sy FROM my)
SELECT n_cells,
       n_rows,
       CAST(FLOOR(CAST(smi AS DOUBLE) / CAST(n_rows AS DOUBLE)
         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mi_micro,
       CAST(ROUND(ln(CAST(n_rows AS DOUBLE)) * CAST(1000000 AS DOUBLE))
         AS BIGINT)
       - CAST(FLOOR(CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE)
         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS h_x_micro,
       CAST(ROUND(ln(CAST(n_rows AS DOUBLE)) * CAST(1000000 AS DOUBLE))
         AS BIGINT)
       - CAST(FLOOR(CAST(sy AS DOUBLE) / CAST(n_rows AS DOUBLE)
         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS h_y_micro
FROM sums CROSS JOIN hx CROSS JOIN hy
"""

QUERIES["feat_mutual_info"] = QuerySpec(
    q_feat_mutual_info, Q_FEAT_MUTUAL_INFO_ORACLE
)


# -- chi-squared independence test + Cramér's V (r13) -------------------------------------
# The frequentist companion to feat_mutual_info's information-theoretic
# readout: Pearson's χ² test of independence between two categorical
# columns (is the language mix the same across sources?) with its effect
# size, Cramér's V — the pair every drift review quotes (χ² says "not
# independent", V says "by how much" on a 0..1 scale). The grid is the FULL
# |X|×|Y| cross of observed levels (a structurally-absent cell is a real
# O=0 with E>0 — dropping it inflates independence), built as a broadcast
# margin cross-join, never a fact-side fan-out. Exactness: O and both
# margins are exact BIGINTs; each cell's (O·N − r·c)²/(N·r·c) term
# evaluates in ONE shared double expression quantized once to micro
# (deliberately double throughout — the cross-moment O·N reaches ~1e24 at
# petabyte counts, past DECIMAL(38)'s square headroom; at the driver's SFs
# every factor is exactly representable), then χ² folds as a BIGINT sum of
# per-cell micros and V resolves by one shared sqrt. Scale shape: one fact
# scan collapses map-side to |X|·|Y| cells; margins, grid, and readout are
# all broadcast-sized.
_CHI2_TERM_MICRO = (
    "CAST(FLOOR("
    "(CAST(o AS DOUBLE) * CAST(n_rows AS DOUBLE)"
    " - CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE))"
    " * (CAST(o AS DOUBLE) * CAST(n_rows AS DOUBLE)"
    " - CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE))"
    " * CAST(1000000 AS DOUBLE)"
    " / (CAST(n_rows AS DOUBLE) * CAST(r_tot AS DOUBLE)"
    " * CAST(c_tot AS DOUBLE))"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_CRAMERS_V_MICRO = (
    "CASE WHEN n_rows > 0 AND LEAST(r_levels, c_levels) > 1 THEN"
    " CAST(FLOOR(sqrt(CAST(chi2_micro AS DOUBLE)"
    " / (CAST(1000000 AS DOUBLE) * CAST(n_rows AS DOUBLE)"
    " * CAST(LEAST(r_levels, c_levels) - 1 AS DOUBLE)))"
    " * CAST(1000000 AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)


def chi2_from_cells(cells: DataFrame) -> DataFrame:
    """The independence-test tail over ADDITIVE (x, y, n_xy) contingency
    facts, however accumulated — shared by the batch query and the
    streaming ledger twin. Margins, the zero-filled grid, per-cell terms,
    and the V readout all derive here."""
    cells = cells.localCheckpoint(eager=False)
    mx = cells.groupBy("x").agg(F.sum("n_xy").cast("bigint").alias("r_tot"))
    my = cells.groupBy("y").agg(F.sum("n_xy").cast("bigint").alias("c_tot"))
    tot = cells.agg(F.sum("n_xy").cast("bigint").alias("n_rows"))
    grid = (
        mx.crossJoin(F.broadcast(my))
        .join(F.broadcast(cells), ["x", "y"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            "r_tot",
            "c_tot",
            "n_rows",
            F.coalesce("n_xy", F.lit(0)).cast("bigint").alias("o"),
        )
    )
    folded = grid.selectExpr(
        "n_rows", f"{_CHI2_TERM_MICRO} AS term_micro"
    ).agg(
        F.max("n_rows").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("term_micro").cast("bigint").alias("chi2_micro"),
    )
    levels = mx.agg(F.count(F.lit(1)).cast("bigint").alias("r_levels")).crossJoin(
        F.broadcast(my.agg(F.count(F.lit(1)).cast("bigint").alias("c_levels")))
    )
    return (
        folded.crossJoin(F.broadcast(levels))
        .selectExpr(
            "n_rows",
            "n_cells",
            "r_levels",
            "c_levels",
            "(r_levels - 1) * (c_levels - 1) AS dof",
            "chi2_micro",
            f"{_CRAMERS_V_MICRO} AS cramers_v_micro",
        )
    )


def q_feat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy(
        F.col("lang").alias("x"), F.col("source").alias("y")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
    return chi2_from_cells(cells)


Q_FEAT_CHI2_ORACLE = f"""
WITH cells AS (
  SELECT lang AS x, source AS y, CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM documents GROUP BY 1, 2
),
mx AS (SELECT x, CAST(SUM(n_xy) AS BIGINT) AS r_tot FROM cells GROUP BY x),
my AS (SELECT y, CAST(SUM(n_xy) AS BIGINT) AS c_tot FROM cells GROUP BY y),
tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_rows FROM cells),
grid AS (
  SELECT mx.x, my.y, r_tot, c_tot, n_rows,
         CAST(COALESCE(c.n_xy, 0) AS BIGINT) AS o
  FROM mx CROSS JOIN my
  LEFT JOIN cells c ON c.x = mx.x AND c.y = my.y
  CROSS JOIN tot
),
folded AS (
  SELECT MAX(n_rows) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM({_CHI2_TERM_MICRO}) AS BIGINT) AS chi2_micro
  FROM grid
),
levels AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM mx) AS r_levels,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM my) AS c_levels
)
SELECT n_rows, n_cells, r_levels, c_levels,
       (r_levels - 1) * (c_levels - 1) AS dof,
       chi2_micro,
       {_CRAMERS_V_MICRO} AS cramers_v_micro
FROM folded CROSS JOIN levels
"""


QUERIES["feat_chi2_independence"] = QuerySpec(
    q_feat_chi2_independence, Q_FEAT_CHI2_ORACLE
)


# -- priority-sample threshold estimator (r12) -------------------------------------------------
# sample_weighted_reservoir keeps the top-k priority sample; this query adds
# the other half of Duffield/Lund/Thorup priority sampling — the THRESHOLD
# ESTIMATOR: with tau = the (k+1)-th priority, each sampled row's
# Horvitz-Thompson weight is max(w_i, tau) and the sample's est_total is an
# unbiased estimate of the stratum's TRUE total weight. Publishing the
# estimate next to the true per-language totals makes the estimator's
# accuracy the oracle-checked value. Exactness: priorities are one IEEE
# division of exact integers (the reservoir's 48-bit md5 fraction, same salt
# — so this IS the same sample, deliberately: one draw, two readouts);
# per-row estimates are micro-quantized BEFORE the k-term sum, so the sum is
# an exact BIGINT. Scale shape: two column-pruned fact scans (rank + totals
# — re-scanning 3 columns is cheaper than checkpointing a fact table), both
# windows partitioned by the stratum; nothing larger than |lang| rows after.
PRIORITY_EST_K = 25  # matches RESERVOIR_K: the same published sample


def priority_estimator_report(cands: DataFrame, totals: DataFrame) -> DataFrame:
    """The report tail over (lang, doc_id, n_chars) CANDIDATE rows and
    (lang, n_docs, total_chars) totals. Batch passes the full documents
    frame; the streaming twin passes its folded candidate ledger (per-batch
    top-(k+1) per stratum — a mergeable bound: any global top-(k+1) row is
    in its own batch's top-(k+1)) and SUM-folded totals. Priorities are a
    pure function of doc_id, so re-deriving them at readout is batching-
    invariant by construction."""
    from pyspark.sql import Window

    from movie_genre_data_pipeline_spark.functions.sampling import sample_tag

    u = (
        F.conv(F.substring(sample_tag("doc_id", "priority"), 1, 12), 16, 10)
        .cast("bigint")
        + F.lit(1)
    ).cast("double") / F.lit(float(1 << 48))
    tagged = cands.withColumn(
        "priority", F.col("n_chars").cast("double") / u
    )
    wlang = Window.partitionBy("lang")
    ranked = tagged.withColumn(
        "rn",
        F.row_number().over(
            wlang.orderBy(F.col("priority").desc(), F.col("doc_id").asc())
        ),
    ).withColumn(
        "tau",
        F.coalesce(
            F.max(
                F.when(
                    F.col("rn") == PRIORITY_EST_K + 1, F.col("priority")
                )
            ).over(wlang),
            F.lit(0.0).cast("double"),
        ),
    )
    sampled = ranked.filter(F.col("rn") <= PRIORITY_EST_K).withColumn(
        "est_micro",
        F.expr(
            "CAST(FLOOR(GREATEST(CAST(n_chars AS DOUBLE), tau)"
            " * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ),
    )
    rep = sampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum("n_chars").cast("bigint").alias("sampled_chars"),
        F.expr(
            "CAST(FLOOR(MAX(tau) * CAST(1000000 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("tau_micro"),
        F.sum("est_micro").cast("bigint").alias("est_total_micro"),
    )
    return rep.join(F.broadcast(totals), "lang").select(
        "lang",
        "n_sampled",
        "sampled_chars",
        "tau_micro",
        "est_total_micro",
        "n_docs",
        "total_chars",
    )


def q_sample_priority_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    totals = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    return priority_estimator_report(d, totals)


Q_PRIORITY_ESTIMATOR_ORACLE = f"""
WITH tagged AS (
  SELECT lang, doc_id, n_chars,
         CAST(n_chars AS DOUBLE) /
           ((CAST(concat('0x', substring(md5(doc_id || ':priority'), 1, 12))
                  AS BIGINT) + 1) / {float(1 << 48)!r}) AS priority
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, n_chars, priority,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY priority DESC, doc_id ASC) AS rn
  FROM tagged
),
taus AS (
  SELECT lang,
         COALESCE(MAX(CASE WHEN rn = {PRIORITY_EST_K + 1} THEN priority END),
                  CAST(0 AS DOUBLE)) AS tau
  FROM ranked GROUP BY lang
),
sampled AS (
  SELECT r.lang, r.n_chars, t.tau,
         CAST(FLOOR(GREATEST(CAST(r.n_chars AS DOUBLE), t.tau)
              * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS est_micro
  FROM ranked r JOIN taus t USING (lang) WHERE r.rn <= {PRIORITY_EST_K}
),
rep AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
         CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
         CAST(FLOOR(MAX(tau) * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS tau_micro,
         CAST(SUM(est_micro) AS BIGINT) AS est_total_micro
  FROM sampled GROUP BY lang
),
totals AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY lang
)
SELECT r.lang, r.n_sampled, r.sampled_chars, r.tau_micro, r.est_total_micro,
       t.n_docs, t.total_chars
FROM rep r JOIN totals t USING (lang)
"""

QUERIES["sample_priority_estimator"] = QuerySpec(
    q_sample_priority_estimator, Q_PRIORITY_ESTIMATOR_ORACLE
)


# -- target-leakage screen: per-feature MI against a label (r12) -------------------------------
# feat_mutual_info prices ONE feature pair; the screen a modeler actually
# runs before training prices EVERY candidate feature against the label in
# one report, ranked by how much of the label's entropy the feature already
# explains — the standard pre-training leakage/relevance triage (a feature
# with nmi ~= 1 is leakage; ~0 is noise). Same exact-integer MI arithmetic
# as feat_mutual_info (per-cell ln of an exact integer ratio, micro-nat
# quantization, DECIMAL(38,0) weighted sums), generalized to a per-feature
# grain. Scale shape: ONE fact scan unpivoted via stack (5x rows map-side,
# collapsed by the map-side-combined cell groupBy before any shuffle);
# everything after runs on bounded (feature x value) tables with broadcast
# marginals.
LEAKAGE_FEATURES: list[tuple[str, str]] = [
    # (feature name, engine-portable expression over orders)
    ("order_priority", "o_orderpriority"),
    ("order_year", "CAST(year(o_orderdate) AS STRING)"),
    ("order_month", "CAST(month(o_orderdate) AS STRING)"),
    ("cust_mod10", "CAST(o_custkey % 10 AS STRING)"),
    (
        "price_band",
        "CAST(CAST(FLOOR(CAST(o_totalprice AS DOUBLE)"
        " / CAST(50000 AS DOUBLE)) AS BIGINT) AS STRING)",
    ),
]


def mutual_info_screen_from_cells(cells: DataFrame) -> DataFrame:
    """The per-feature MI tail: `cells` is (feature, x, y, n_xy) — additive
    contingency facts for EVERY screened feature, however accumulated (one
    stacked batch scan or a streaming ledger folded by SUM). Same five-
    consumer fan-out as mutual_info_from_cells, so the same barrier pin."""
    cells = cells.localCheckpoint(eager=False)
    mx = cells.groupBy("feature", "x").agg(
        F.sum("n_xy").cast("bigint").alias("n_x")
    )
    my = cells.groupBy("feature", "y").agg(
        F.sum("n_xy").cast("bigint").alias("n_y")
    )
    tot = cells.groupBy("feature").agg(
        F.sum("n_xy").cast("bigint").alias("n_rows")
    )
    joined = (
        cells.join(F.broadcast(mx), ["feature", "x"])
        .join(F.broadcast(my), ["feature", "y"])
        .join(F.broadcast(tot), "feature")
    )
    sums = joined.groupBy("feature").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("n_rows").cast("bigint").alias("n_rows"),
        F.expr(f"SUM(CAST({_MI_CELL} AS DECIMAL(38,0)) * n_xy)").alias("smi"),
    )
    hx = mx.groupBy("feature").agg(F.expr(_H_TERM.format(n="n_x")).alias("sx"))
    hy = my.groupBy("feature").agg(F.expr(_H_TERM.format(n="n_y")).alias("sy"))
    ent = (
        "CAST(ROUND(ln(CAST(n_rows AS DOUBLE)) * CAST(1000000 AS DOUBLE))"
        " AS BIGINT)"
        " - CAST(FLOOR(CAST({s} AS DOUBLE) / CAST(n_rows AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    return (
        sums.join(F.broadcast(hx), "feature")
        .join(F.broadcast(hy), "feature")
        .selectExpr(
            "feature",
            "n_cells",
            "n_rows",
            "CAST(FLOOR(CAST(smi AS DOUBLE) / CAST(n_rows AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mi_micro",
            ent.format(s="sx") + " AS h_x_micro",
            ent.format(s="sy") + " AS h_y_micro",
        )
        .selectExpr(
            "feature",
            "n_cells",
            "n_rows",
            "mi_micro",
            "h_x_micro",
            "h_y_micro",
            # share of label entropy the feature explains — the leakage dial;
            # derived from already-quantized integers, so exact cross-engine
            "CASE WHEN h_y_micro > 0 THEN"
            " CAST(FLOOR(CAST(mi_micro AS DOUBLE) * CAST(1000000 AS DOUBLE)"
            " / CAST(h_y_micro AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END AS nmi_y_micro",
        )
    )


def leakage_cell_facts(orders: DataFrame) -> DataFrame:
    """(feature, x, y, n_xy) — the stacked additive contingency facts over
    one orders scan (stack unpivots the feature expressions map-side)."""
    stack_expr = ", ".join(
        f"'{name}', {expr}" for name, expr in LEAKAGE_FEATURES
    )
    return (
        orders.selectExpr(
            f"stack({len(LEAKAGE_FEATURES)}, {stack_expr}) AS (feature, x)",
            "o_orderstatus AS y",
        )
        .groupBy("feature", "x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
    )


def q_feat_leakage_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return mutual_info_screen_from_cells(leakage_cell_facts(o))


def _leakage_oracle() -> str:
    sel = "\nUNION ALL ".join(
        f"SELECT '{name}' AS feature, {expr.replace('AS STRING', 'AS VARCHAR')}"
        f" AS x, o_orderstatus AS y FROM orders"
        for name, expr in LEAKAGE_FEATURES
    )
    return f"""
WITH stacked AS (
{sel}
),
cells AS (
  SELECT feature, x, y, CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM stacked GROUP BY 1, 2, 3
),
mx AS (SELECT feature, x, CAST(SUM(n_xy) AS BIGINT) AS n_x
       FROM cells GROUP BY 1, 2),
my AS (SELECT feature, y, CAST(SUM(n_xy) AS BIGINT) AS n_y
       FROM cells GROUP BY 1, 2),
tot AS (SELECT feature, CAST(SUM(n_xy) AS BIGINT) AS n_rows
        FROM cells GROUP BY 1),
sums AS (
  SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_cells,
         MAX(n_rows) AS n_rows,
         SUM(CAST({_MI_CELL} AS DECIMAL(38,0)) * n_xy) AS smi
  FROM cells JOIN mx USING (feature, x) JOIN my USING (feature, y)
       JOIN tot USING (feature)
  GROUP BY feature
),
hx AS (SELECT feature, {_H_TERM.format(n="n_x")} AS sx FROM mx GROUP BY feature),
hy AS (SELECT feature, {_H_TERM.format(n="n_y")} AS sy FROM my GROUP BY feature),
ents AS (
  SELECT feature, n_cells, n_rows,
         CAST(FLOOR(CAST(smi AS DOUBLE) / CAST(n_rows AS DOUBLE)
           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mi_micro,
         CAST(ROUND(ln(CAST(n_rows AS DOUBLE)) * CAST(1000000 AS DOUBLE))
           AS BIGINT)
         - CAST(FLOOR(CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE)
           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS h_x_micro,
         CAST(ROUND(ln(CAST(n_rows AS DOUBLE)) * CAST(1000000 AS DOUBLE))
           AS BIGINT)
         - CAST(FLOOR(CAST(sy AS DOUBLE) / CAST(n_rows AS DOUBLE)
           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS h_y_micro
  FROM sums JOIN hx USING (feature) JOIN hy USING (feature)
)
SELECT feature, n_cells, n_rows, mi_micro, h_x_micro, h_y_micro,
       CASE WHEN h_y_micro > 0 THEN
         CAST(FLOOR(CAST(mi_micro AS DOUBLE) * CAST(1000000 AS DOUBLE)
           / CAST(h_y_micro AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS nmi_y_micro
FROM ents
"""


QUERIES["feat_leakage_screen"] = QuerySpec(
    q_feat_leakage_screen, _leakage_oracle()
)


# -- feature pricing: weight-of-evidence / information value (r12) -----------------------
# The credit-scoring companion to the MI leakage screen: per feature bin,
# WoE = ln(P(bin|pos) / P(bin|neg)) prices how hard the bin separates the
# binary target, and IV = Σ (pos_share − neg_share)·WoE summarizes the
# feature (IV < 0.02 noise, > 0.5 suspicious/leaky — the standard triage
# bands). Exactness discipline: WoE uses the Laplace-smoothed EXACT integer
# ratio ((2·n_pos+1)·(2·N+B)) / ((2·n_neg+1)·(2·P+B)) so no bin divides by
# zero, each factor cast to DOUBLE before the multiply (the _MI_CELL
# overflow spell); the distribution shares are micro-quantized integers
# FIRST, so every IV contribution is an exact (share_diff × woe_micro)
# integer and the corpus sum is accumulation-order-free. Scale shape: one
# stacked orders scan collapsed map-side into (feature, bin) cells; the
# report runs on bounded cell tables with broadcast per-feature totals.
# FLOOR(x+0.5), not ROUND: WoE is frequently NEGATIVE, and ROUND of a
# negative non-integer-derived double is the one rounding form that has
# diverged between Spark and a driver-side DuckDB before (the r6 lesson
# text_queries.py:1136 documents; VERDICT r12 advice re-flagged this
# instance). The shared half-up-toward-+inf spell is representation-stable
# on both engines.
_WOE_MICRO = (
    "CAST(FLOOR(ln((CAST(2 * n_pos + 1 AS DOUBLE)"
    " * CAST(2 * t_neg + n_bins AS DOUBLE))"
    " / (CAST(2 * n_neg + 1 AS DOUBLE)"
    " * CAST(2 * t_pos + n_bins AS DOUBLE)))"
    " * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_SHARE_MICRO = (
    "CAST(FLOOR(CAST({n} AS DOUBLE) * CAST(1000000 AS DOUBLE)"
    " / CAST({t} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_IV_MICRO = (
    "CAST(FLOOR(CAST(iv_sum AS DOUBLE) / CAST(1000000 AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


def woe_cell_facts(orders: DataFrame) -> DataFrame:
    """(feature, x, n_pos, n_neg) — stacked additive per-bin target counts
    over ONE orders scan (y = order finalized, the same binary the target
    encoder prices); SUM-foldable, so the streaming twin appends these."""
    stack_expr = ", ".join(
        f"'{name}', {expr}" for name, expr in LEAKAGE_FEATURES
    )
    return (
        orders.selectExpr(
            f"stack({len(LEAKAGE_FEATURES)}, {stack_expr}) AS (feature, x)",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
        )
        .groupBy("feature", "x")
        .agg(
            F.sum("y").cast("bigint").alias("n_pos"),
            F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
        )
    )


def woe_iv_report_from_cells(cells: DataFrame) -> DataFrame:
    """The WoE/IV tail over additive (feature, x, n_pos, n_neg) facts,
    however accumulated (one stacked batch scan or a streaming ledger folded
    by SUM). Two consumers of `cells` (the totals aggregate and the bin
    join), so the cell fan-out is barrier-pinned."""
    cells = cells.localCheckpoint(eager=False)
    tot = cells.groupBy("feature").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("n_pos").cast("bigint").alias("t_pos"),
        F.sum("n_neg").cast("bigint").alias("t_neg"),
    )
    bins = cells.join(F.broadcast(tot), "feature").selectExpr(
        "feature",
        "n_bins",
        "t_pos",
        "t_neg",
        f"{_WOE_MICRO} AS woe_micro",
        f"{_SHARE_MICRO.format(n='n_pos', t='t_pos')} AS pos_share_micro",
        f"{_SHARE_MICRO.format(n='n_neg', t='t_neg')} AS neg_share_micro",
    )
    return (
        bins.groupBy("feature")
        .agg(
            F.max("n_bins").alias("n_bins"),
            F.max("t_pos").alias("n_pos"),
            F.max("t_neg").alias("n_neg"),
            F.expr(
                "SUM((pos_share_micro - neg_share_micro) * woe_micro)"
            ).alias("iv_sum"),
            F.min("woe_micro").alias("woe_min_micro"),
            F.max("woe_micro").alias("woe_max_micro"),
        )
        .selectExpr(
            "feature",
            "n_bins",
            "n_pos",
            "n_neg",
            f"{_IV_MICRO} AS iv_micro",
            "woe_min_micro",
            "woe_max_micro",
        )
    )


def q_feat_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return woe_iv_report_from_cells(woe_cell_facts(o))


def _woe_oracle() -> str:
    sel = "\nUNION ALL ".join(
        f"SELECT '{name}' AS feature, {expr.replace('AS STRING', 'AS VARCHAR')}"
        f" AS x, CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y"
        f" FROM orders"
        for name, expr in LEAKAGE_FEATURES
    )
    return f"""
WITH stacked AS (
{sel}
),
cells AS (
  SELECT feature, x,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(1 - y) AS BIGINT) AS n_neg
  FROM stacked GROUP BY 1, 2
),
tot AS (
  SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_bins,
         CAST(SUM(n_pos) AS BIGINT) AS t_pos,
         CAST(SUM(n_neg) AS BIGINT) AS t_neg
  FROM cells GROUP BY 1
),
bins AS (
  SELECT feature, n_bins, t_pos, t_neg,
         {_WOE_MICRO} AS woe_micro,
         {_SHARE_MICRO.format(n="n_pos", t="t_pos")} AS pos_share_micro,
         {_SHARE_MICRO.format(n="n_neg", t="t_neg")} AS neg_share_micro
  FROM cells JOIN tot USING (feature)
),
folded AS (
  SELECT feature, MAX(n_bins) AS n_bins, MAX(t_pos) AS n_pos,
         MAX(t_neg) AS n_neg,
         SUM((pos_share_micro - neg_share_micro) * woe_micro) AS iv_sum,
         MIN(woe_micro) AS woe_min_micro,
         MAX(woe_micro) AS woe_max_micro
  FROM bins GROUP BY feature
)
SELECT feature, n_bins, n_pos, n_neg, {_IV_MICRO} AS iv_micro,
       woe_min_micro, woe_max_micro
FROM folded
"""


QUERIES["feat_woe_iv"] = QuerySpec(q_feat_woe_iv, _woe_oracle())


# -- weighting audit: Kish effective sample size (r12) ------------------------------------
# The audit a curator runs before trusting a WEIGHTED corpus: if documents
# enter the loss (or a sampler) weighted by quality, the effective number of
# documents per language is Kish's ESS = (Σw)²/Σw² — equal weights give
# ESS = n, one dominant document drives it toward 1, and a low ESS/n ratio
# says the weighting collapsed the stratum onto a few documents (variance
# inflation). Exactness: w is the ALREADY-ORACLED 6dp quality score snapped
# to integer micro-units, so Σw and Σw² are exact DECIMAL(38,0) integer
# sums and ESS resolves in one IEEE-exact double expression + the
# FLOOR(x+0.5) spell. Scale shape: ONE documents scan with scan-local
# feature extraction collapsed map-side into |languages| rows.
_ESS_MICRO = (
    "CASE WHEN sum_w2 > 0 THEN"
    " CAST(FLOOR(CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)"
    " * CAST(1000000 AS DOUBLE) / CAST(sum_w2 AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)
_ESS_RATIO_MICRO = (
    "CAST(FLOOR(CAST(ess_micro AS DOUBLE) / CAST(n_docs AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


def quality_weight_facts(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, sum_w, sum_w2) — additive per-language weight moments
    over ONE documents scan (w = micro-quantized quality, a scan-local
    arrival decision). SUM-foldable, so the streaming twin appends these."""
    from movie_genre_data_pipeline_spark.functions.text import quality_score

    w = (
        F.round(quality_score("text") * F.lit(1000000.0))
        .cast("bigint")
        .alias("w")
    )
    return (
        docs.select("lang", w)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            # DECIMAL(38,0) accumulate: w ≤ 1e6 micro, so a BIGINT Σw wraps
            # past ~9e12 documents (non-ANSI SUM is silent about it)
            F.expr("SUM(CAST(w AS DECIMAL(38,0)))").alias("sum_w"),
            F.expr("SUM(CAST(w AS DECIMAL(38,0)) * w)").alias("sum_w2"),
        )
    )


def ess_report_from_facts(facts: DataFrame) -> DataFrame:
    """The ESS tail over additive per-language weight moments, however
    accumulated (one batch scan or a streaming ledger folded by SUM)."""
    return facts.selectExpr(
        "lang",
        "n_docs",
        "CAST(sum_w AS BIGINT) AS sum_w_micro",
        f"{_ESS_MICRO} AS ess_micro",
    ).selectExpr(
        "lang",
        "n_docs",
        "sum_w_micro",
        "ess_micro",
        f"{_ESS_RATIO_MICRO} AS ess_ratio_micro",
    )


def q_sample_ess_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return ess_report_from_facts(quality_weight_facts(d))


def _ess_oracle() -> str:
    # the weight IS text_quality_scores' oracled formula — embedded as a
    # nested CTE (never re-spelled), so the two strings cannot drift
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_QUALITY_SCORES_ORACLE,
    )

    return f"""
WITH q AS ({Q_QUALITY_SCORES_ORACLE}),
w AS (
  SELECT d.lang, CAST(ROUND(q.quality * 1000000.0) AS BIGINT) AS w
  FROM documents d JOIN q ON q.doc_id = d.doc_id
),
facts AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS DECIMAL(38,0)) AS sum_w,
         SUM(CAST(w AS DECIMAL(38,0)) * w) AS sum_w2
  FROM w GROUP BY 1
),
ess AS (
  SELECT lang, n_docs, CAST(sum_w AS BIGINT) AS sum_w_micro,
         {_ESS_MICRO} AS ess_micro
  FROM facts
)
SELECT lang, n_docs, sum_w_micro, ess_micro,
       {_ESS_RATIO_MICRO} AS ess_ratio_micro
FROM ess
"""


QUERIES["sample_ess_report"] = QuerySpec(q_sample_ess_report, _ess_oracle())


# -- selector evaluation: exact Mann-Whitney AUC (r12) ------------------------------------
# The ranking-evaluation readout the selection family was missing: AUC of
# the DSIR log-weight as a classifier score for the target domain —
# P[score(random target doc) > score(random non-target doc)] with ties at
# half, i.e. the probability the selector RANKS a target doc above a
# non-target one (0.5 = blind, 1.0 = perfect separation). Computed exactly
# by the grouped Mann-Whitney identity: group docs by distinct score, take
# the exclusive prefix sum of negative counts in score order, and fold
# U2 = Σ c_pos·(2·cum_neg_below + c_neg) (twice U so ties stay integral);
# AUC = U2 / (2·P·N) resolves in one IEEE-exact double expression + the
# FLOOR(x+0.5) spell. Scale shape: one doc-keyed score aggregate, then the
# distinct-score table's prefix sum runs RANGE-PARTITIONED
# (operators/ranking.ranged_running_sum — no single-task window even if
# every doc scores uniquely), and the readout is a 1-row reduction.
_AUC_MICRO = (
    "CASE WHEN n_pos > 0 AND n_neg > 0 THEN"
    " CAST(FLOOR(CAST(u2 AS DOUBLE) * CAST(1000000 AS DOUBLE)"
    " / (CAST(2 AS DOUBLE) * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)


def auc_report_from_labeled(labeled: DataFrame) -> DataFrame:
    """The Mann-Whitney tail over (y BOOLEAN, logw_micro) rows, however the
    scores were derived (one batch scoring pass or a readout over the DSIR
    ledgers). Grouped-tie identity + range-partitioned prefix sum."""
    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_running_sum,
    )

    groups = labeled.groupBy(F.col("logw_micro").alias("s")).agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("c_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("bigint").alias("c_neg"),
    )
    cum = ranged_running_sum(
        groups, ["s"], F.col("c_neg"), "cum_neg_below"
    )
    sums = cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
        F.sum("c_pos").cast("bigint").alias("n_pos"),
        F.sum("c_neg").cast("bigint").alias("n_neg"),
        # DECIMAL(38,0): U2 is O(P·N) pair counts — quadratic in docs, past
        # 2^63 the moment both classes clear ~2e9
        F.expr(
            "SUM(CAST(c_pos AS DECIMAL(38,0))"
            " * (2 * cum_neg_below + c_neg))"
        ).alias("u2"),
    )
    return sums.selectExpr(
        "n_pos",
        "n_neg",
        "n_scores",
        f"{_AUC_MICRO} AS auc_micro",
    ).selectExpr(
        "n_pos",
        "n_neg",
        "n_scores",
        "auc_micro",
        "auc_micro * 2 - 1000000 AS gini_micro",
    )


def q_feat_auc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance

    d = load(spark, sf_dir, "documents")
    w = dsir_importance(
        d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    )
    labeled = (
        d.select("doc_id", (F.col("lang") == "en").alias("y"))
        .join(w, "doc_id")
        .select("y", "logw_micro")
    )
    return auc_report_from_labeled(labeled)


def _auc_oracle() -> str:
    return f"""
WITH {_dsir_w_ctes()},
labeled AS (
  SELECT w.doc_id, w.logw_micro, d.lang = 'en' AS y
  FROM w JOIN documents d USING (doc_id)
),
groups AS (
  SELECT logw_micro AS s,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
         CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
  FROM labeled GROUP BY 1
),
cum AS (
  SELECT s, c_pos, c_neg,
         CAST(COALESCE(SUM(c_neg) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_neg_below
  FROM groups
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_scores,
         CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_neg) AS BIGINT) AS n_neg,
         SUM(CAST(c_pos AS DECIMAL(38,0))
             * (2 * cum_neg_below + c_neg)) AS u2
  FROM cum
)
SELECT n_pos, n_neg, n_scores, {_AUC_MICRO} AS auc_micro,
       {_AUC_MICRO} * 2 - 1000000 AS gini_micro
FROM sums
"""


QUERIES["feat_auc_report"] = QuerySpec(q_feat_auc_report, _auc_oracle())


# -- selector evaluation: average precision / PR-AUC (r13) --------------------------------
# The imbalanced-regime companion to the ROC AUC (VERDICT r12 #4): when the
# positive class is tiny — the regime an LLM-data selector actually runs in —
# ROC AUC stays optimistic because true negatives dominate both axes, while
# the precision-recall curve prices exactly what the curator pays for: of the
# documents the selector ranks highest, how many are really target-domain?
# AP = Σ_k ΔR_k·P_k over distinct scores DESCENDING (the step-wise
# average_precision convention, ties grouped), via the same (s, c_pos, c_neg)
# table as the AUC: TP_k = P − pos_below(k) and at-or-above_k = N_tot −
# all_below(k) re-derive both curve axes from two range-partitioned exclusive
# prefix sums. Exactness: each group's term is quantized ONCE to pico units
# (FLOOR(c_pos·TP·1e12/at_or_above + 0.5) — one deterministic double
# expression, identical text both engines), accumulated in DECIMAL(38,0)
# (terms reach c_pos·1e12, past BIGINT the moment one tie group holds ~9e6
# positives), and AP resolves in one final double divide + the half-up
# spell. The random-classifier baseline for AP is the PREVALENCE P/(P+N)
# (not 0.5) — published alongside so the lift is readable. Scale shape: one
# doc-keyed score aggregate, two ranged prefix sums over the distinct-score
# table (operators/ranking — no single-task window), broadcast 1-row totals,
# 1-row readout.
_AP_TERM_PICO = (
    "CASE WHEN c_pos > 0 THEN"
    " CAST(FLOOR(CAST(c_pos AS DOUBLE)"
    " * CAST(n_pos - cum_pos_below AS DOUBLE)"
    " * CAST(1000000000000 AS DOUBLE)"
    " / CAST(n_pos + n_neg - cum_all_below AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS DECIMAL(38,0))"
    " ELSE CAST(0 AS DECIMAL(38,0)) END"
)
_AP_MICRO = (
    "CASE WHEN n_pos > 0 AND n_neg > 0 THEN"
    " CAST(FLOOR(CAST(ap_sum AS DOUBLE)"
    " / (CAST(1000000 AS DOUBLE) * CAST(n_pos AS DOUBLE))"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)
_PREVALENCE_MICRO = (
    "CAST(FLOOR(CAST(n_pos AS DOUBLE) * CAST(1000000 AS DOUBLE)"
    " / CAST(n_pos + n_neg AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


def pr_auc_report_from_labeled(labeled: DataFrame) -> DataFrame:
    """The average-precision tail over (y BOOLEAN, logw_micro) rows, however
    the scores were derived — shared by the batch query and the streaming
    ledger readout, exactly like auc_report_from_labeled."""
    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_running_sum,
    )

    groups = labeled.groupBy(F.col("logw_micro").alias("s")).agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("c_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("bigint").alias("c_neg"),
    )
    cum = ranged_running_sum(groups, ["s"], F.col("c_pos"), "cum_pos_below")
    cum = ranged_running_sum(
        cum, ["s"], F.col("c_pos") + F.col("c_neg"), "cum_all_below"
    )
    tot = cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
        F.sum("c_pos").cast("bigint").alias("n_pos"),
        F.sum("c_neg").cast("bigint").alias("n_neg"),
    )
    sums = (
        cum.crossJoin(F.broadcast(tot))
        .selectExpr(
            "n_pos",
            "n_neg",
            "n_scores",
            f"{_AP_TERM_PICO} AS term_pico",
        )
        .agg(
            F.max("n_pos").alias("n_pos"),
            F.max("n_neg").alias("n_neg"),
            F.max("n_scores").alias("n_scores"),
            F.sum("term_pico").alias("ap_sum"),
        )
    )
    return sums.selectExpr(
        "n_pos",
        "n_neg",
        "n_scores",
        f"{_AP_MICRO} AS ap_micro",
        f"{_PREVALENCE_MICRO} AS prevalence_micro",
    )


def q_feat_pr_auc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance

    d = load(spark, sf_dir, "documents")
    w = dsir_importance(
        d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    )
    labeled = (
        d.select("doc_id", (F.col("lang") == "en").alias("y"))
        .join(w, "doc_id")
        .select("y", "logw_micro")
    )
    return pr_auc_report_from_labeled(labeled)


def _pr_auc_oracle() -> str:
    return f"""
WITH {_dsir_w_ctes()},
labeled AS (
  SELECT w.doc_id, w.logw_micro, d.lang = 'en' AS y
  FROM w JOIN documents d USING (doc_id)
),
groups AS (
  SELECT logw_micro AS s,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
         CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
  FROM labeled GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_scores,
         CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_neg) AS BIGINT) AS n_neg
  FROM groups
),
cum AS (
  SELECT s, c_pos, c_neg,
         CAST(COALESCE(SUM(c_pos) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_pos_below,
         CAST(COALESCE(SUM(c_pos + c_neg) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_all_below
  FROM groups
),
sums AS (
  SELECT MAX(t.n_pos) AS n_pos, MAX(t.n_neg) AS n_neg,
         MAX(t.n_scores) AS n_scores,
         SUM({_AP_TERM_PICO}) AS ap_sum
  FROM cum CROSS JOIN tot t
)
SELECT n_pos, n_neg, n_scores, {_AP_MICRO} AS ap_micro,
       {_PREVALENCE_MICRO} AS prevalence_micro
FROM sums
"""


QUERIES["feat_pr_auc_report"] = QuerySpec(q_feat_pr_auc_report, _pr_auc_oracle())


# -- selector evaluation: Kolmogorov-Smirnov separation (r13) -----------------------------
# The third leg of the scorecard-evaluation triple (AUC ranks, calibration
# prices confidence, KS localizes): KS = max_s |F_pos(s) − F_neg(s)| over the
# score axis — the single best cutoff's class separation, THE standard
# scorecard acceptance statistic, and unlike AUC it also says WHERE to cut
# (the published ks_at_score). Exactness: with the same (s, c_pos, c_neg)
# grouped table, inclusive-ascending CDFs make each gap an EXACT integer
# cross-product |cum_pos·n_neg − cum_neg·n_pos| (DECIMAL(38,0) — the product
# is O(n²) past 2^63 when both classes clear ~3e9) and the max is
# order-free, so KS needs NO per-term double quantization at all: one double
# divide at the very end. The argmax score is tie-broken by MIN(s) so both
# engines publish the same cutoff. Scale shape: identical to the AUC — one
# doc-keyed score aggregate, one range-partitioned prefix sum (inclusive =
# exclusive + own count), a 1-row max-reduce, and one broadcast-back join to
# recover the argmax score.
_KS_MICRO = (
    "CASE WHEN n_pos > 0 AND n_neg > 0 THEN"
    " CAST(FLOOR(CAST(ks_num AS DOUBLE) * CAST(1000000 AS DOUBLE)"
    " / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)


def ks_report_from_labeled(labeled: DataFrame) -> DataFrame:
    """The KS tail over (y BOOLEAN, logw_micro) rows, however the scores were
    derived — shared by the batch query and the streaming ledger readout.
    `gaps` feeds two consumers (the max-reduce and the argmax join-back), so
    the prefix-sum fan-out is barrier-pinned."""
    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_running_sum,
    )

    groups = labeled.groupBy(F.col("logw_micro").alias("s")).agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("c_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("bigint").alias("c_neg"),
    )
    cum = ranged_running_sum(groups, ["s"], F.col("c_pos"), "pos_below")
    cum = ranged_running_sum(cum, ["s"], F.col("c_neg"), "neg_below")
    tot = cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
        F.sum("c_pos").cast("bigint").alias("n_pos"),
        F.sum("c_neg").cast("bigint").alias("n_neg"),
    )
    # inclusive CDFs (exclusive prefix + the group's own count); each gap is
    # the exact integer cross-product, so the max is integer-ordered and no
    # per-term quantization exists anywhere.
    gaps = (
        cum.selectExpr(
            "s",
            "CAST(pos_below + c_pos AS BIGINT) AS cum_pos",
            "CAST(neg_below + c_neg AS BIGINT) AS cum_neg",
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "s",
            "n_pos",
            "n_neg",
            "n_scores",
            "abs(CAST(cum_pos AS DECIMAL(38,0)) * n_neg"
            " - CAST(cum_neg AS DECIMAL(38,0)) * n_pos) AS gap_num",
        )
        .localCheckpoint(eager=False)
    )
    best = gaps.agg(
        F.max("n_pos").alias("n_pos"),
        F.max("n_neg").alias("n_neg"),
        F.max("n_scores").alias("n_scores"),
        F.max("gap_num").alias("ks_num"),
    )
    at = (
        gaps.join(
            F.broadcast(best.select(F.col("ks_num").alias("__best"))),
            F.col("gap_num") == F.col("__best"),
        )
        .agg(F.min("s").cast("bigint").alias("ks_at_score"))
    )
    return best.crossJoin(F.broadcast(at)).selectExpr(
        "n_pos",
        "n_neg",
        "n_scores",
        f"{_KS_MICRO} AS ks_micro",
        "ks_at_score",
    )


def q_feat_ks_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance

    d = load(spark, sf_dir, "documents")
    w = dsir_importance(
        d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    )
    labeled = (
        d.select("doc_id", (F.col("lang") == "en").alias("y"))
        .join(w, "doc_id")
        .select("y", "logw_micro")
    )
    return ks_report_from_labeled(labeled)


def _ks_oracle() -> str:
    return f"""
WITH {_dsir_w_ctes()},
labeled AS (
  SELECT w.doc_id, w.logw_micro, d.lang = 'en' AS y
  FROM w JOIN documents d USING (doc_id)
),
groups AS (
  SELECT logw_micro AS s,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
         CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
  FROM labeled GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_scores,
         CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_neg) AS BIGINT) AS n_neg
  FROM groups
),
cum AS (
  SELECT s,
         CAST(SUM(c_pos) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_pos,
         CAST(SUM(c_neg) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_neg
  FROM groups
),
gaps AS (
  SELECT s, t.n_pos, t.n_neg, t.n_scores,
         abs(CAST(cum_pos AS DECIMAL(38,0)) * t.n_neg
             - CAST(cum_neg AS DECIMAL(38,0)) * t.n_pos) AS gap_num
  FROM cum CROSS JOIN tot t
),
best AS (
  SELECT MAX(n_pos) AS n_pos, MAX(n_neg) AS n_neg,
         MAX(n_scores) AS n_scores, MAX(gap_num) AS ks_num
  FROM gaps
),
at AS (
  SELECT CAST(MIN(g.s) AS BIGINT) AS ks_at_score
  FROM gaps g JOIN best b ON g.gap_num = b.ks_num
)
SELECT n_pos, n_neg, n_scores, {_KS_MICRO} AS ks_micro, ks_at_score
FROM best CROSS JOIN at
"""


QUERIES["feat_ks_report"] = QuerySpec(q_feat_ks_report, _ks_oracle())


# -- classifier calibration: reliability bins (r12) ---------------------------------------
# The evaluation companion to the AUC report on the PROBABILITY axis: a
# classifier can rank perfectly yet lie about its confidence. Score every
# row under the IRLS fit's FINAL betas, bin the predicted probability into
# deciles, and compare each bin's mean prediction against its observed
# positive rate — the reliability diagram, whose per-bin |gap| rolls up to
# ECE (the law test pins the weighted roll-up). Exactness: mu is the
# already-integer micro-sigmoid (functions/regression.SIGMOID_MICRO_SQL),
# so bins are integer DIV, and both per-bin means divide exact integer sums
# once (Σmu in DECIMAL(38,0) — n·1e6 passes 2^63 at ~9e12 rows). Scale
# shape: the IRLS fit is iters x a d²-sized map-side-combined Gram; scoring
# + binning is ONE more scan collapsed map-side into 10 rows.
_CAL_AVG_PRED = (
    "CAST(FLOOR(CAST(sum_mu AS DOUBLE) / CAST(n_rows AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_CAL_OBS_RATE = (
    "CAST(FLOOR(CAST(sum_y AS DOUBLE) * CAST(1000000 AS DOUBLE)"
    " / CAST(n_rows AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


def _logreg_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, y, mu_micro) for every order under the IRLS fit's FINAL betas —
    the shared front half of the probability-axis evaluations (calibration
    report, Brier decomposition, conformal threshold; k = the orderkey, the
    deterministic split handle). The fit is iters x the d²-sized
    map-side-combined Gram; only the d+1 final micro-betas are collected;
    scoring is one more scan-local projection."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        SIGMOID_MICRO_SQL,
        logreg_irls_micro,
    )

    o = load(spark, sf_dir, "orders")
    feats = o.select(
        F.col("o_orderkey").cast("bigint").alias("k"),
        (F.col("o_orderkey") % 180 + 60).cast("bigint").alias("x1"),
        (F.col("o_custkey") % 25).cast("bigint").alias("x2"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":logreg"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("u48"),
    ).withColumn("zt", F.expr(_LOGREG_ZT))
    labeled = feats.select("k", "x1", "x2", F.expr(_LOGREG_LABEL).alias("y"))
    traj = logreg_irls_micro(labeled, "x1", "x2", "y", iters=LOGREG_ITERS)
    final = traj.filter(F.col("iter") == LOGREG_ITERS).collect()[0]
    b0, b1, b2 = final["b0_micro"], final["b1_micro"], final["b2_micro"]
    return labeled.select(
        "k",
        "y",
        (
            F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
        ).alias("z_micro"),
    ).withColumn("mu_micro", F.expr(SIGMOID_MICRO_SQL))


def q_feat_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _logreg_scored(spark, sf_dir)
    bins = scored.groupBy(
        F.expr("mu_micro DIV 100000").cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("y").cast("bigint").alias("sum_y"),
        F.expr("SUM(CAST(mu_micro AS DECIMAL(38,0)))").alias("sum_mu"),
    )
    return bins.selectExpr(
        "bin",
        "n_rows",
        f"{_CAL_AVG_PRED} AS avg_pred_micro",
        f"{_CAL_OBS_RATE} AS obs_rate_micro",
    ).selectExpr(
        "bin",
        "n_rows",
        "avg_pred_micro",
        "obs_rate_micro",
        "avg_pred_micro - obs_rate_micro AS gap_micro",
    )


def _logreg_scored_ctes() -> str:
    """The fit-and-score chain as WITH-body text ending at
    scored(y, mu_micro) — the oracle twin of _logreg_scored, shared by the
    calibration and Brier-decomposition oracles so the scoring chain is
    spelled exactly once."""
    from movie_genre_data_pipeline_spark.functions.regression import (
        SIGMOID_MICRO_SQL,
    )

    head = f"""WITH f AS MATERIALIZED (
  SELECT k, x1, x2, {_LOGREG_LABEL} AS y
  FROM (
    SELECT k, x1, x2, u48, {_LOGREG_ZT} AS zt
    FROM (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(o_orderkey % 180 + 60 AS BIGINT) AS x1,
             CAST(o_custkey % 25 AS BIGINT) AS x2,
             CAST(concat('0x', substring(md5(o_orderkey || ':logreg'), 1, 12))
               AS BIGINT) AS u48
      FROM orders))
),
b0 AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1,
              CAST(0 AS BIGINT) AS b2)"""
    scored = f""",
scored AS (
  SELECT k, y, {SIGMOID_MICRO_SQL} AS mu_micro
  FROM (SELECT f.k, f.y, b.b0 + b.b1 * x1 + b.b2 * x2 AS z_micro
        FROM f CROSS JOIN b{LOGREG_ITERS} b)
)"""
    return head + _irls_ctes(LOGREG_ITERS) + scored


def _calibration_oracle() -> str:
    tail = f""",
bins AS (
  SELECT CAST(mu_micro // 100000 AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(y) AS BIGINT) AS sum_y,
         SUM(CAST(mu_micro AS DECIMAL(38,0))) AS sum_mu
  FROM scored GROUP BY 1
)
SELECT bin, n_rows, {_CAL_AVG_PRED} AS avg_pred_micro,
       {_CAL_OBS_RATE} AS obs_rate_micro,
       {_CAL_AVG_PRED} - {_CAL_OBS_RATE} AS gap_micro
FROM bins
"""
    return _logreg_scored_ctes() + tail


QUERIES["feat_calibration_report"] = QuerySpec(
    q_feat_calibration_report, _calibration_oracle()
)


# -- classifier evaluation: Brier score + Murphy decomposition (r13) ----------------------
# The scalar that prices the WHOLE probability axis at once: the Brier score
# (mean squared error of the predicted probability) and its Murphy (1973)
# decomposition over the calibration deciles — reliability (how far bin
# confidence sits from bin truth; lower is better, the ECE's squared
# cousin), resolution (how far bin truths spread from the base rate; HIGHER
# is better — a classifier can be perfectly calibrated and useless), and
# uncertainty (the base rate's own variance, the floor no model beats
# without information). With binned predictions the 3-term identity is
# exact; with raw scores it carries two extra terms (Stephenson et al.'s
# generalized decomposition) which we PUBLISH instead of hiding — the
# within-bin prediction variance and the within-bin prediction-outcome
# covariance: brier ≈ reliability − resolution + uncertainty + within_bin
# − 2·within_cov (law-tested to quantization tolerance). Exactness: mu is the
# integer micro-sigmoid, so Σ(mu − 1e6·y)², per-bin (Σmu − 1e6·Σy)², and
# Σmu² are exact DECIMAL(38,0) integers; each per-bin term quantizes ONCE
# through a shared double expression + FLOOR(x+0.5), and each readout
# divides once by 1e6·N. Scale shape: the IRLS fit (iters × d² Gram), then
# ONE more scan collapsed map-side into 10 bin rows + a 1-row global.
_BRIER_MICRO = (
    "CAST(FLOOR(CAST(sum_sq AS DOUBLE)"
    " / (CAST(1000000 AS DOUBLE) * CAST(n_rows AS DOUBLE))"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_YBAR_MICRO = (
    "CAST(FLOOR(CAST(sum_y AS DOUBLE) * CAST(1000000 AS DOUBLE)"
    " / CAST(n_rows AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_UNC_MICRO = (
    "CAST(FLOOR(CAST(ybar_micro * (1000000 - ybar_micro) AS DOUBLE)"
    " / CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
# per-bin n_k·(p̄_k − ȳ_k)² in micro² units = (Σmu_k − 1e6·Σy_k)²/n_k —
# the numerator squared exactly in DECIMAL(38,0), ONE double divide
_REL_TERM = (
    "CAST(FLOOR(CAST(CAST(b_sum_mu - 1000000 * b_sum_y AS DECIMAL(38,0))"
    " * (b_sum_mu - 1000000 * b_sum_y) AS DOUBLE)"
    " / CAST(b_n AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DECIMAL(38,0))"
)
# per-bin n_k·(ȳ_k − ȳ)² in micro² units = (1e6·Σy_k − n_k·ȳ_micro)²/n_k
_RES_TERM = (
    "CAST(FLOOR(CAST(CAST(1000000 * b_sum_y - b_n * ybar_micro"
    " AS DECIMAL(38,0))"
    " * (1000000 * b_sum_y - b_n * ybar_micro) AS DOUBLE)"
    " / CAST(b_n AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DECIMAL(38,0))"
)
# per-bin within-bin prediction variance Σmu² − (Σmu)²/n_k in micro² units
_WB_TERM = (
    "CAST(FLOOR(CAST(b_sum_mu2 AS DOUBLE)"
    " - CAST(CAST(b_sum_mu AS DECIMAL(38,0)) * b_sum_mu AS DOUBLE)"
    " / CAST(b_n AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DECIMAL(38,0))"
)
# per-bin within-bin prediction-outcome covariance, micro² units:
# 1e6·(Σmu·y − Σmu·Σy/n_k) — signed, so FLOOR(x+0.5) is the half-up spell
_WC_TERM = (
    "CAST(FLOOR(CAST(1000000 AS DOUBLE) * (CAST(b_sum_mu_y AS DOUBLE)"
    " - CAST(CAST(b_sum_mu AS DECIMAL(38,0)) * b_sum_y AS DOUBLE)"
    " / CAST(b_n AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS DECIMAL(38,0))"
)
_TERM_TO_MICRO = (
    "CAST(FLOOR(CAST({t} AS DOUBLE)"
    " / (CAST(1000000 AS DOUBLE) * CAST(n_rows AS DOUBLE))"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


def q_feat_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _logreg_scored(spark, sf_dir).localCheckpoint(eager=False)
    glob = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("y").cast("bigint").alias("sum_y"),
        F.expr(
            "SUM(CAST(mu_micro - 1000000 * y AS DECIMAL(38,0))"
            " * (mu_micro - 1000000 * y))"
        ).alias("sum_sq"),
    ).selectExpr(
        "n_rows",
        "sum_y",
        "sum_sq",
        f"{_YBAR_MICRO} AS ybar_micro",
    )
    bins = scored.groupBy(
        F.expr("mu_micro DIV 100000").cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("b_n"),
        F.sum("y").cast("bigint").alias("b_sum_y"),
        F.expr("SUM(CAST(mu_micro AS DECIMAL(38,0)))").alias("b_sum_mu"),
        F.expr("SUM(CAST(mu_micro AS DECIMAL(38,0)) * mu_micro)").alias(
            "b_sum_mu2"
        ),
        F.expr("SUM(CAST(mu_micro AS DECIMAL(38,0)) * y)").alias("b_sum_mu_y"),
    )
    terms = (
        bins.crossJoin(F.broadcast(glob))
        .selectExpr(
            "n_rows",
            "sum_y",
            "sum_sq",
            "ybar_micro",
            f"{_REL_TERM} AS rel_term",
            f"{_RES_TERM} AS res_term",
            f"{_WB_TERM} AS wb_term",
            f"{_WC_TERM} AS wc_term",
        )
        .groupBy("n_rows", "sum_y", "sum_sq", "ybar_micro")
        .agg(
            F.sum("rel_term").alias("rel_sum"),
            F.sum("res_term").alias("res_sum"),
            F.sum("wb_term").alias("wb_sum"),
            F.sum("wc_term").alias("wc_sum"),
        )
    )
    return terms.selectExpr(
        "n_rows",
        "ybar_micro",
        f"{_BRIER_MICRO} AS brier_micro",
        f"{_UNC_MICRO} AS unc_micro",
        f"{_TERM_TO_MICRO.format(t='rel_sum')} AS reliability_micro",
        f"{_TERM_TO_MICRO.format(t='res_sum')} AS resolution_micro",
        f"{_TERM_TO_MICRO.format(t='wb_sum')} AS within_bin_micro",
        f"{_TERM_TO_MICRO.format(t='wc_sum')} AS within_cov_micro",
    )


def _brier_oracle() -> str:
    tail = f""",
gtot AS (
  SELECT n_rows, sum_y, sum_sq, {_YBAR_MICRO} AS ybar_micro
  FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(y) AS BIGINT) AS sum_y,
           SUM(CAST(mu_micro - 1000000 * y AS DECIMAL(38,0))
               * (mu_micro - 1000000 * y)) AS sum_sq
    FROM scored)
),
bins AS (
  SELECT CAST(mu_micro // 100000 AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS b_n,
         CAST(SUM(y) AS BIGINT) AS b_sum_y,
         SUM(CAST(mu_micro AS DECIMAL(38,0))) AS b_sum_mu,
         SUM(CAST(mu_micro AS DECIMAL(38,0)) * mu_micro) AS b_sum_mu2,
         SUM(CAST(mu_micro AS DECIMAL(38,0)) * y) AS b_sum_mu_y
  FROM scored GROUP BY 1
),
terms AS (
  SELECT n_rows, sum_y, sum_sq, ybar_micro,
         SUM({_REL_TERM}) AS rel_sum,
         SUM({_RES_TERM}) AS res_sum,
         SUM({_WB_TERM}) AS wb_sum,
         SUM({_WC_TERM}) AS wc_sum
  FROM bins CROSS JOIN gtot
  GROUP BY 1, 2, 3, 4
)
SELECT n_rows, ybar_micro,
       {_BRIER_MICRO} AS brier_micro,
       {_UNC_MICRO} AS unc_micro,
       {_TERM_TO_MICRO.format(t='rel_sum')} AS reliability_micro,
       {_TERM_TO_MICRO.format(t='res_sum')} AS resolution_micro,
       {_TERM_TO_MICRO.format(t='wb_sum')} AS within_bin_micro,
       {_TERM_TO_MICRO.format(t='wc_sum')} AS within_cov_micro
FROM terms
"""
    return _logreg_scored_ctes() + tail


QUERIES["feat_brier_decomposition"] = QuerySpec(
    q_feat_brier_decomposition, _brier_oracle()
)


# -- uncertainty: deterministic Poisson-bootstrap CI (r12) --------------------------------
# The statistic a curator should report WITH every per-language quality
# mean: its sampling uncertainty. At cluster scale the standard resampling
# method is the POISSON bootstrap (each row enters replicate r with weight
# k ~ Poisson(1) — no global resample, one scan generates every replicate
# map-side; Chamandy et al., "Estimating Uncertainty for Massive Data
# Streams", Google 2012). Determinism: k is a pure function of
# md5(doc_id:boot:r) through the Poisson(1) inverse CDF whose cumulative
# thresholds are embedded as SHARED double literals (the lexicon
# discipline — nothing transcendental is evaluated at query time), so both
# engines draw the identical replicate weights. Exactness: each replicate
# mean is one integer division of exact BIGINT sums (Σ k·q_micro / Σ k,
# k ≤ 7 by truncation), and the CI bounds are order statistics (ranks 2
# and B−1 of the B=32 sorted replicate means — a ~94% interpercentile
# band). Scale shape: ONE doc scan fans out x32 map-side (explode of a
# literal range), collapses to (lang, replicate) partials, then |langs|
# rows; the sorted replicate array is B-sized per language.
BOOT_B = 32
_POISSON1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
)
_BOOT_K = (
    "CASE "
    + " ".join(
        f"WHEN u < {t} THEN CAST({k} AS BIGINT)"
        for k, t in enumerate(_POISSON1_CDF)
    )
    + " ELSE CAST(7 AS BIGINT) END"
)
_BOOT_MEAN = (
    "CASE WHEN sum_k > 0 THEN"
    " CAST(FLOOR(CAST(sum_kq AS DOUBLE) / CAST(sum_k AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)


def bootstrap_replicate_facts(docs: DataFrame) -> DataFrame:
    """(lang, r, sum_k, sum_kq) + the point-estimate facts (n_docs, sum_q)
    folded per (lang, replicate) — additive, so the streaming twin appends
    these. The replicate weight is an ARRIVAL decision (pure doc_id hash)."""
    from movie_genre_data_pipeline_spark.functions.text import quality_score

    q = (
        F.round(quality_score("text") * F.lit(1000000.0))
        .cast("bigint")
        .alias("q")
    )
    reps = (
        docs.select("doc_id", "lang", q)
        .select(
            "doc_id",
            "lang",
            "q",
            F.explode(F.expr(f"sequence(0, {BOOT_B - 1})")).alias("r"),
        )
        .selectExpr(
            "lang",
            "r",
            "q",
            "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING),"
            " ':boot:', CAST(r AS STRING))), 1, 12), 16, 10) AS BIGINT)"
            " / CAST(281474976710656 AS DOUBLE) AS u",
        )
        .withColumn("k", F.expr(_BOOT_K))
    )
    return reps.groupBy("lang", "r").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("q").cast("decimal(38,0)").alias("sum_q"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.expr("SUM(CAST(k AS DECIMAL(38,0)) * q)").alias("sum_kq"),
    )


def bootstrap_ci_from_facts(facts: DataFrame) -> DataFrame:
    """The CI tail over additive (lang, r) replicate facts: replicate means,
    then order statistics over the B-sized sorted array per language."""
    means = facts.selectExpr(
        "lang",
        "r",
        "n_docs",
        "sum_q",
        f"{_BOOT_MEAN} AS mean_r_micro",
    )
    return (
        means.groupBy("lang")
        .agg(
            F.max("n_docs").cast("bigint").alias("n_docs"),
            F.max("sum_q").alias("sum_q"),
            F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
            F.sort_array(F.collect_list("mean_r_micro")).alias("ms"),
        )
        .selectExpr(
            "lang",
            "n_docs",
            "n_replicates",
            "CAST(FLOOR(CAST(sum_q AS DOUBLE) / CAST(n_docs AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mean_micro",
            "element_at(ms, 2) AS ci_lo_micro",
            f"element_at(ms, {BOOT_B - 1}) AS ci_hi_micro",
        )
    )


def q_sample_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return bootstrap_ci_from_facts(bootstrap_replicate_facts(d))


def _bootstrap_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_QUALITY_SCORES_ORACLE,
    )

    return f"""
WITH qv AS ({Q_QUALITY_SCORES_ORACLE}),
base AS (
  SELECT d.doc_id, d.lang, CAST(ROUND(qv.quality * 1000000.0) AS BIGINT) AS q
  FROM documents d JOIN qv ON qv.doc_id = d.doc_id
),
reps AS (
  SELECT lang, r, q,
         CAST(concat('0x', substring(md5(doc_id || ':boot:' || r), 1, 12))
           AS BIGINT) / CAST(281474976710656 AS DOUBLE) AS u
  FROM base, UNNEST(generate_series(0, {BOOT_B - 1})) AS g(r)
),
weighted AS (SELECT lang, r, q, {_BOOT_K} AS k FROM reps),
facts AS (
  SELECT lang, r,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(q) AS DECIMAL(38,0)) AS sum_q,
         CAST(SUM(k) AS BIGINT) AS sum_k,
         SUM(CAST(k AS DECIMAL(38,0)) * q) AS sum_kq
  FROM weighted GROUP BY 1, 2
),
means AS (
  SELECT lang, r, n_docs, sum_q, {_BOOT_MEAN} AS mean_r_micro FROM facts
),
folded AS (
  SELECT lang,
         CAST(MAX(n_docs) AS BIGINT) AS n_docs,
         MAX(sum_q) AS sum_q,
         CAST(COUNT(*) AS BIGINT) AS n_replicates,
         list_sort(list(mean_r_micro)) AS ms
  FROM means GROUP BY 1
)
SELECT lang, n_docs, n_replicates,
       CAST(FLOOR(CAST(sum_q AS DOUBLE) / CAST(n_docs AS DOUBLE)
         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mean_micro,
       ms[2] AS ci_lo_micro,
       ms[{BOOT_B - 1}] AS ci_hi_micro
FROM folded
"""


QUERIES["sample_bootstrap_ci"] = QuerySpec(
    q_sample_bootstrap_ci, _bootstrap_oracle()
)


# -- uncertainty on the evaluation itself: bootstrap CI of the AUC (r13) ------------------
# An AUC without an error bar is how selector "improvements" ship on noise:
# at realistic positive-class sizes the Mann-Whitney statistic's sampling
# spread easily exceeds the deltas teams act on. This composes the two r12
# families — each document enters replicate r with the deterministic
# Poisson(1) weight k(doc_id, ':aucboot:', r) (one scan fans out ×B
# map-side, Chamandy et al.), and each replicate's WEIGHTED AUC runs through
# the same grouped Mann-Whitney identity with k-weighted class counts. The
# per-replicate prefix sum stays RANGE-PARTITIONED at corpus scale: ONE
# global exclusive prefix over (r, s) order, then each replicate subtracts
# its base (the sum of all earlier replicates' negatives — a B-row table,
# broadcast) to recover its own exclusive prefix; U2 folds in DECIMAL(38,0)
# per replicate and the CI is order statistics over the B sorted replicate
# AUCs (ranks 2 and B−1 — the ~94% band, the bootstrap family's shared
# convention). The point estimate is the plain unweighted AUC in the same
# row. Scale shape: ×B fan-out map-side, one (r, s)-keyed aggregate, one
# ranged prefix sum, B-row readout.
def partitioned_mann_whitney_sums(groups: DataFrame, part_col: str) -> DataFrame:
    """Per-partition Mann-Whitney folds over a (part, s, c_pos, c_neg)
    grouped-score table: (part, n_pos, n_neg, n_scores, u2), with EVERY
    partition's exclusive negative-prefix recovered from ONE global
    range-partitioned prefix sum over (part, s) order minus broadcast
    per-partition bases — |parts| replicate/segment slices never become
    |parts| single-task windows, and the base offsets are a |parts|-row
    window over a non-foldable-constant partition spec (the
    ranged_running_sum offset discipline). Shared by the bootstrap
    replicates (part = r) and the by-segment evaluation (part = source)."""
    from pyspark.sql import Window

    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_running_sum,
    )

    cum = ranged_running_sum(
        groups, [F.col(part_col), F.col("s")], F.col("c_neg"), "g_neg_below"
    )
    part_tot = groups.groupBy(part_col).agg(
        F.sum("c_neg").cast("bigint").alias("part_neg")
    )
    base_w = (
        Window.partitionBy(
            F.expr(f"substring(CAST({part_col} AS STRING), 1, 0)")
        )
        .orderBy(part_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = part_tot.select(
        part_col,
        F.coalesce(F.sum("part_neg").over(base_w), F.lit(0))
        .cast("bigint")
        .alias("neg_base"),
    )
    return (
        cum.join(F.broadcast(bases), part_col)
        .withColumn("cum_neg_below", F.col("g_neg_below") - F.col("neg_base"))
        .groupBy(part_col)
        .agg(
            F.sum("c_pos").cast("bigint").alias("n_pos"),
            F.sum("c_neg").cast("bigint").alias("n_neg"),
            F.count(F.lit(1)).cast("bigint").alias("n_scores"),
            F.expr(
                "SUM(CAST(c_pos AS DECIMAL(38,0))"
                " * (2 * cum_neg_below + c_neg))"
            ).alias("u2"),
        )
    )


def auc_bootstrap_from_labeled(labeled: DataFrame) -> DataFrame:
    """The bootstrap-AUC tail over (doc_id, y, logw_micro) rows, however the
    scores were derived. `labeled` feeds the replicate fan-out AND the plain
    point-estimate pass, so it is barrier-pinned."""
    labeled = labeled.localCheckpoint(eager=False)
    reps = (
        labeled.select(
            "doc_id",
            "y",
            F.col("logw_micro").alias("s"),
            F.explode(F.expr(f"sequence(0, {BOOT_B - 1})")).alias("r"),
        )
        .selectExpr(
            "r",
            "s",
            "y",
            "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING),"
            " ':aucboot:', CAST(r AS STRING))), 1, 12), 16, 10) AS BIGINT)"
            " / CAST(281474976710656 AS DOUBLE) AS u",
        )
        .withColumn("k", F.expr(_BOOT_K))
    )
    groups = reps.groupBy("r", "s").agg(
        F.sum(F.when(F.col("y"), F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("c_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(F.col("k")))
        .cast("bigint")
        .alias("c_neg"),
    )
    per_rep = partitioned_mann_whitney_sums(groups, "r")
    aucs = per_rep.selectExpr("r", f"{_AUC_MICRO} AS auc_r_micro")
    band = aucs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
        F.sort_array(F.collect_list("auc_r_micro")).alias("ms"),
    ).selectExpr(
        "n_replicates",
        "element_at(ms, 2) AS ci_lo_micro",
        f"element_at(ms, {BOOT_B - 1}) AS ci_hi_micro",
    )
    point = auc_report_from_labeled(labeled.select("y", "logw_micro")).select(
        "n_pos", "n_neg", "auc_micro"
    )
    return point.crossJoin(F.broadcast(band)).select(
        "n_pos",
        "n_neg",
        "auc_micro",
        "n_replicates",
        "ci_lo_micro",
        "ci_hi_micro",
    )


def q_feat_auc_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance

    d = load(spark, sf_dir, "documents")
    w = dsir_importance(
        d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    )
    labeled = (
        d.select("doc_id", (F.col("lang") == "en").alias("y"))
        .join(w, "doc_id")
        .select("doc_id", "y", "logw_micro")
    )
    return auc_bootstrap_from_labeled(labeled)


def _auc_bootstrap_oracle() -> str:
    return f"""
WITH {_dsir_w_ctes()},
labeled AS (
  SELECT w.doc_id, w.logw_micro, d.lang = 'en' AS y
  FROM w JOIN documents d USING (doc_id)
),
reps AS (
  SELECT r, logw_micro AS s, y,
         CAST(concat('0x', substring(md5(doc_id || ':aucboot:' || r), 1, 12))
           AS BIGINT) / CAST(281474976710656 AS DOUBLE) AS u
  FROM labeled, UNNEST(generate_series(0, {BOOT_B - 1})) AS g(r)
),
weighted AS (SELECT r, s, y, {_BOOT_K} AS k FROM reps),
rgroups AS (
  SELECT r, s,
         CAST(SUM(CASE WHEN y THEN k ELSE 0 END) AS BIGINT) AS c_pos,
         CAST(SUM(CASE WHEN y THEN 0 ELSE k END) AS BIGINT) AS c_neg
  FROM weighted GROUP BY 1, 2
),
rcum AS (
  SELECT r, s, c_pos, c_neg,
         CAST(COALESCE(SUM(c_neg) OVER (PARTITION BY r ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_neg_below
  FROM rgroups
),
per_rep AS (
  SELECT r,
         CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_neg) AS BIGINT) AS n_neg,
         SUM(CAST(c_pos AS DECIMAL(38,0))
             * (2 * cum_neg_below + c_neg)) AS u2
  FROM rcum GROUP BY 1
),
aucs AS (SELECT r, {_AUC_MICRO} AS auc_r_micro FROM per_rep),
band AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
         list_sort(list(auc_r_micro)) AS ms
  FROM aucs
),
pgroups AS (
  SELECT logw_micro AS s,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
         CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
  FROM labeled GROUP BY 1
),
pcum AS (
  SELECT s, c_pos, c_neg,
         CAST(COALESCE(SUM(c_neg) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_neg_below
  FROM pgroups
),
point AS (
  SELECT CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_neg) AS BIGINT) AS n_neg,
         SUM(CAST(c_pos AS DECIMAL(38,0))
             * (2 * cum_neg_below + c_neg)) AS u2
  FROM pcum
)
SELECT p.n_pos, p.n_neg, {_AUC_MICRO} AS auc_micro,
       b.n_replicates, b.ms[2] AS ci_lo_micro,
       b.ms[{BOOT_B - 1}] AS ci_hi_micro
FROM point p CROSS JOIN band b
"""


QUERIES["feat_auc_bootstrap_ci"] = QuerySpec(
    q_feat_auc_bootstrap_ci, _auc_bootstrap_oracle()
)


# -- selector evaluation: per-segment AUC (r13) -------------------------------------------
# The slicing every aggregate evaluation hides: a corpus-level AUC can be
# carried entirely by the head segment while the selector is blind on the
# tail — the "works on every source or just the web crawl?" check a curator
# runs before trusting a selector fleet-wide. One pass computes the exact
# Mann-Whitney AUC PER SOURCE: groups keyed by (source, score), then the
# shared partitioned fold (partitioned_mann_whitney_sums — one global ranged
# prefix + broadcast per-source bases, never |sources| single-task windows).
# Segments where the label is one-sided (n_pos or n_neg = 0) print 0 rather
# than NULL — the CASE both engines share.
def q_feat_auc_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance

    d = load(spark, sf_dir, "documents")
    w = dsir_importance(
        d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    )
    labeled = (
        d.select("doc_id", "source", (F.col("lang") == "en").alias("y"))
        .join(w, "doc_id")
        .select("source", "y", "logw_micro")
    )
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


def _auc_by_segment_oracle() -> str:
    return f"""
WITH {_dsir_w_ctes()},
labeled AS (
  SELECT w.source, w.logw_micro, d.lang = 'en' AS y
  FROM w JOIN documents d USING (doc_id)
),
groups AS (
  SELECT source, logw_micro AS s,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
         CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
  FROM labeled GROUP BY 1, 2
),
cum AS (
  SELECT source, s, c_pos, c_neg,
         CAST(COALESCE(SUM(c_neg) OVER (PARTITION BY source ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_neg_below
  FROM groups
),
sums AS (
  SELECT source,
         CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_neg) AS BIGINT) AS n_neg,
         CAST(COUNT(*) AS BIGINT) AS n_scores,
         SUM(CAST(c_pos AS DECIMAL(38,0))
             * (2 * cum_neg_below + c_neg)) AS u2
  FROM cum GROUP BY 1
)
SELECT source, n_pos, n_neg, n_scores, {_AUC_MICRO} AS auc_micro,
       {_AUC_MICRO} * 2 - 1000000 AS gini_micro
FROM sums
"""


QUERIES["feat_auc_by_segment"] = QuerySpec(
    q_feat_auc_by_segment, _auc_by_segment_oracle()
)


# -- selector evaluation: leakage-free cross-validated AUC (r13) --------------------------
# Every AUC above scores documents under a model that SAW them — the
# resubstitution optimism every ML practitioner is taught to distrust. This
# is the leakage-free form: 5-fold leave-one-fold-out DSIR evaluation where
# each document is scored under the bucket model built from the OTHER four
# folds, at the cost of ZERO extra corpus scans — additivity again: the
# per-(fold, bucket) cell counts are one grouped scan, and fold f's
# training model is the GLOBAL model minus fold f's own cells (a 5×256-row
# subtraction, not a refit). Each fold's complement log-ratio table
# broadcasts into the postings, each doc scores under its own fold's
# complement model, and the per-fold exact Mann-Whitney runs through the
# shared partitioned fold. A cv AUC materially below the resubstitution AUC
# is the overfit signal this query exists to print. Scale shape: the same
# two corpus-sized steps as plain DSIR (term explode, doc-keyed score
# fold); everything fold-related is ≤ 5×buckets rows.
CV_FOLDS = 5
_CV_FOLD_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':cvfold')),"
    " 1, 12), 16, 10) AS BIGINT) % " + str(CV_FOLDS)
)
_CV_FOLD_DUCK = (
    "CAST(concat('0x', substring(md5(doc_id || ':cvfold'), 1, 12))"
    " AS BIGINT) % " + str(CV_FOLDS)
)


def auc_cv_from_parts(
    docs: DataFrame, cells: DataFrame, tf: DataFrame
) -> DataFrame:
    """The leave-one-fold-out AUC tail over the three additive parts —
    docs (doc_id, fold, y), per-fold bucket cells (fold, bucket, raw_c,
    tgt_c), postings (doc_id, bucket, tf) — however accumulated (one batch
    scan or SUM-folded ledgers). Fold models are complement subtractions of
    the global model; `cells` feeds the global fold AND the left side of
    the complement join, so it is barrier-pinned."""
    b = DSIR_BUCKETS
    cells = cells.localCheckpoint(eager=False)
    glob = cells.groupBy("bucket").agg(
        F.sum("raw_c").cast("bigint").alias("raw_tot"),
        F.sum("tgt_c").cast("bigint").alias("tgt_tot"),
    )
    comp = (
        glob.selectExpr(
            "bucket",
            "raw_tot",
            "tgt_tot",
            f"explode(sequence(0, {CV_FOLDS - 1})) AS fold",
        )
        .join(cells, ["fold", "bucket"], "left")
        .selectExpr(
            "fold",
            "bucket",
            "raw_tot - coalesce(raw_c, 0) AS raw_c",
            "tgt_tot - coalesce(tgt_c, 0) AS tgt_c",
        )
        .localCheckpoint(eager=False)
    )
    ftot = comp.groupBy("fold").agg(
        F.sum("raw_c").cast("bigint").alias("t_raw"),
        F.sum("tgt_c").cast("bigint").alias("t_tgt"),
    )
    ratios = comp.join(F.broadcast(ftot), "fold").select(
        "fold",
        "bucket",
        F.round(
            (
                F.log(
                    (F.col("tgt_c") + F.lit(1.0))
                    / (F.col("t_tgt") + F.lit(float(b)))
                )
                - F.log(
                    (F.col("raw_c") + F.lit(1.0))
                    / (F.col("t_raw") + F.lit(float(b)))
                )
            )
            * F.lit(1e6),
            0,
        )
        .cast("bigint")
        .alias("lr_micro"),
    )
    scored = (
        tf.selectExpr("doc_id", "bucket", "tf", f"{_CV_FOLD_SPARK} AS fold")
        .join(F.broadcast(ratios), ["fold", "bucket"])
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("lr_micro")).cast("bigint").alias("logw_micro")
        )
    )
    labeled = docs.join(scored, "doc_id", "left").select(
        "fold",
        "y",
        F.coalesce("logw_micro", F.lit(0)).cast("bigint").alias("logw_micro"),
    )
    groups = labeled.groupBy("fold", F.col("logw_micro").alias("s")).agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("c_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("bigint").alias("c_neg"),
    )
    sums = partitioned_mann_whitney_sums(groups, "fold")
    return sums.selectExpr(
        "CAST(fold AS BIGINT) AS fold",
        "n_pos",
        "n_neg",
        "n_scores",
        f"{_AUC_MICRO} AS auc_micro",
    )


def q_feat_auc_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.sampling import (
        dsir_postings,
        dsir_term_buckets,
    )

    d = load(spark, sf_dir, "documents")
    docs = d.selectExpr(
        "doc_id", "lang = 'en' AS y", f"{_CV_FOLD_SPARK} AS fold"
    )
    terms = dsir_term_buckets(
        d, "doc_id", "text", (F.col("lang") == "en"), DSIR_BUCKETS
    ).selectExpr("doc_id", "__tgt", "bucket", f"{_CV_FOLD_SPARK} AS fold")
    cells = terms.groupBy("fold", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("raw_c"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0))
        .cast("bigint")
        .alias("tgt_c"),
    )
    tf = dsir_postings(terms)
    return auc_cv_from_parts(docs, cells, tf)


def _auc_cv_oracle() -> str:
    b = DSIR_BUCKETS
    return f"""
WITH docs AS (
  SELECT doc_id, lang = 'en' AS y, {_CV_FOLD_DUCK} AS fold, {_TOKS} AS toks
  FROM documents
),
terms AS (
  SELECT doc_id, y, fold,
         CAST(concat('0x', substring(md5(t.term), 1, 12)) AS BIGINT) % {b}
           AS bucket
  FROM docs, unnest(toks) AS t(term)
),
cells AS (
  SELECT fold, bucket,
         CAST(COUNT(*) AS BIGINT) AS raw_c,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS tgt_c
  FROM terms GROUP BY 1, 2
),
gcells AS (
  SELECT bucket, CAST(SUM(raw_c) AS BIGINT) AS raw_tot,
         CAST(SUM(tgt_c) AS BIGINT) AS tgt_tot
  FROM cells GROUP BY 1
),
allf AS (
  SELECT g.bucket, g.raw_tot, g.tgt_tot, f.fold
  FROM gcells g, UNNEST(generate_series(0, {CV_FOLDS - 1})) AS f(fold)
),
comp AS (
  SELECT a.fold, a.bucket,
         a.raw_tot - COALESCE(c.raw_c, 0) AS raw_c,
         a.tgt_tot - COALESCE(c.tgt_c, 0) AS tgt_c
  FROM allf a LEFT JOIN cells c ON c.fold = a.fold AND c.bucket = a.bucket
),
ftot AS (
  SELECT fold, CAST(SUM(raw_c) AS BIGINT) AS t_raw,
         CAST(SUM(tgt_c) AS BIGINT) AS t_tgt
  FROM comp GROUP BY 1
),
ratios AS (
  SELECT comp.fold, bucket,
         CAST(ROUND((LN((tgt_c + 1.0) / (t_tgt + CAST({b} AS DOUBLE)))
                   - LN((raw_c + 1.0) / (t_raw + CAST({b} AS DOUBLE))))
                    * 1000000.0, 0) AS BIGINT) AS lr_micro
  FROM comp JOIN ftot USING (fold)
),
tf AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
tff AS (SELECT doc_id, {_CV_FOLD_DUCK} AS fold, bucket, tf FROM tf),
scored AS (
  SELECT t.doc_id, CAST(SUM(t.tf * r.lr_micro) AS BIGINT) AS logw_micro
  FROM tff t JOIN ratios r ON r.fold = t.fold AND r.bucket = t.bucket
  GROUP BY 1
),
labeled AS (
  SELECT d.fold, d.y, COALESCE(s.logw_micro, 0) AS logw_micro
  FROM docs d LEFT JOIN scored s USING (doc_id)
),
groups AS (
  SELECT fold, logw_micro AS s,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
         CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
  FROM labeled GROUP BY 1, 2
),
cum AS (
  SELECT fold, s, c_pos, c_neg,
         CAST(COALESCE(SUM(c_neg) OVER (PARTITION BY fold ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_neg_below
  FROM groups
),
sums AS (
  SELECT fold,
         CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_neg) AS BIGINT) AS n_neg,
         CAST(COUNT(*) AS BIGINT) AS n_scores,
         SUM(CAST(c_pos AS DECIMAL(38,0))
             * (2 * cum_neg_below + c_neg)) AS u2
  FROM cum GROUP BY 1
)
SELECT CAST(fold AS BIGINT) AS fold, n_pos, n_neg, n_scores,
       {_AUC_MICRO} AS auc_micro
FROM sums
"""


QUERIES["feat_auc_cv"] = QuerySpec(q_feat_auc_cv, _auc_cv_oracle())


# -- selector monitoring: population stability index (r13) --------------------------------
# The monitoring metric the scorecard world runs NIGHTLY: PSI between the
# score distribution a model was calibrated on and the one it serves today
# (< 0.1 stable, 0.1-0.25 watch, > 0.25 recalibrate — the standard triage
# bands). PSI IS the IV machinery applied between two SNAPSHOTS instead of
# two classes — Σ (cur_share − ref_share)·ln(cur/ref) over score deciles —
# so the cell tail here is literally woe_iv_report_from_cells reused with
# (ref, cur) in the (neg, pos) seats: the same Laplace-smoothed exact
# integer ratios, micro-quantized shares, and order-free integer IV fold.
# Snapshots on the bounded fixture are the deterministic doc_id-parity
# halves (production: two corpus snapshots); bin edges are the REFERENCE
# half's score deciles — ranked by the range-partitioned ntile
# (operators/ranking, the SQL-standard remainder rule both engines share),
# then BOTH halves re-bin by the same pure `count of edges strictly below`
# function of the score, so binning is deterministic even at ties. Scale
# shape: scoring is the plain DSIR pipeline; the decile rank is a ranged
# ntile over the ref half; binning is a broadcast 9-row edge join; the
# readout is a 10-cell WoE fold.
PSI_BINS = 10


def score_psi_from_scored(scored: DataFrame) -> DataFrame:
    """The PSI tail over (doc_id, s, is_ref) rows, however scored. `scored`
    feeds the ranked-edges pass AND the binning pass, so it is
    barrier-pinned."""
    from movie_genre_data_pipeline_spark.operators.ranking import ranged_ntile

    scored = scored.localCheckpoint(eager=False)
    ranked = ranged_ntile(
        scored.filter(F.col("is_ref")),
        [F.col("s"), F.col("doc_id")],
        PSI_BINS,
        "tile",
    )
    edges = (
        ranked.filter(F.col("tile") <= PSI_BINS - 1)
        .groupBy("tile")
        .agg(F.max("s").alias("e"))
        .select("e")
    )
    binned = (
        scored.crossJoin(F.broadcast(edges))
        .groupBy("doc_id", "is_ref")
        .agg(
            F.sum(F.when(F.col("s") > F.col("e"), 1).otherwise(0))
            .cast("bigint")
            .alias("bin")
        )
    )
    cells = (
        binned.groupBy(F.col("bin").cast("string").alias("x"))
        .agg(
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_neg"),
        )
        .select(F.lit("dsir_score").alias("feature"), "x", "n_pos", "n_neg")
    )
    return woe_iv_report_from_cells(cells).selectExpr(
        "feature",
        "n_bins",
        "n_pos AS n_cur",
        "n_neg AS n_ref",
        "iv_micro AS psi_micro",
        "woe_min_micro AS lnratio_min_micro",
        "woe_max_micro AS lnratio_max_micro",
    )


def q_feat_score_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance

    d = load(spark, sf_dir, "documents")
    w = dsir_importance(
        d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    )
    scored = w.select(
        "doc_id",
        F.col("logw_micro").alias("s"),
        (F.col("doc_id") % 2 == 0).alias("is_ref"),
    )
    return score_psi_from_scored(scored)


def _score_psi_oracle() -> str:
    return f"""
WITH {_dsir_w_ctes()},
pscored AS (
  SELECT doc_id, logw_micro AS s, doc_id % 2 = 0 AS is_ref FROM w
),
ranked AS (
  SELECT doc_id, s,
         NTILE({PSI_BINS}) OVER (ORDER BY s, doc_id) AS tile
  FROM pscored WHERE is_ref
),
edges AS (
  SELECT tile, MAX(s) AS e FROM ranked WHERE tile <= {PSI_BINS - 1}
  GROUP BY 1
),
binned AS (
  SELECT sc.doc_id, sc.is_ref,
         CAST(SUM(CASE WHEN sc.s > ed.e THEN 1 ELSE 0 END) AS BIGINT) AS bin
  FROM pscored sc CROSS JOIN edges ed
  GROUP BY 1, 2
),
cells AS (
  SELECT 'dsir_score' AS feature, CAST(bin AS VARCHAR) AS x,
         CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
  FROM binned GROUP BY 1, 2
),
tot AS (
  SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_bins,
         CAST(SUM(n_pos) AS BIGINT) AS t_pos,
         CAST(SUM(n_neg) AS BIGINT) AS t_neg
  FROM cells GROUP BY 1
),
bins AS (
  SELECT feature, n_bins, t_pos, t_neg,
         {_WOE_MICRO} AS woe_micro,
         {_SHARE_MICRO.format(n="n_pos", t="t_pos")} AS pos_share_micro,
         {_SHARE_MICRO.format(n="n_neg", t="t_neg")} AS neg_share_micro
  FROM cells JOIN tot USING (feature)
),
folded AS (
  SELECT feature, MAX(n_bins) AS n_bins, MAX(t_pos) AS n_pos,
         MAX(t_neg) AS n_neg,
         SUM((pos_share_micro - neg_share_micro) * woe_micro) AS iv_sum,
         MIN(woe_micro) AS woe_min_micro,
         MAX(woe_micro) AS woe_max_micro
  FROM bins GROUP BY feature
)
SELECT feature, n_bins, n_pos AS n_cur, n_neg AS n_ref,
       {_IV_MICRO} AS psi_micro,
       woe_min_micro AS lnratio_min_micro,
       woe_max_micro AS lnratio_max_micro
FROM folded
"""


QUERIES["feat_score_psi"] = QuerySpec(q_feat_score_psi, _score_psi_oracle())


# -- selector evaluation: decile lift / cumulative gains (r13) ----------------------------
# The table a curation review actually reads: rank the corpus by the DSIR
# selector's score, cut it into ten deciles, and for each top-k prefix report
# how much of the target class it captures (cumulative gain = recall@decile)
# and how much better than random that is (lift = precision@decile over
# prevalence). AUC/PR-AUC price the whole curve; the gains table prices the
# operating points a budgeted curator can actually choose ("take the top 20%").
# Determinism at ties: deciles come from the range-partitioned ntile over
# (score DESC, doc_id) — the SQL-standard remainder bucketing both engines
# share, with doc_id as the total-order tiebreak, so equal scores land
# identically in both engines. Exactness: per-decile counts are exact BIGINTs;
# cumulative counts are a ranged exclusive prefix sum over the 10-row decile
# table; gain/lift each quantize ONCE via DECIMAL(38,0) numerators cast to
# DOUBLE for a single divide + the FLOOR(x+0.5) spell. Scale shape: scoring is
# the plain DSIR pipeline, the decile rank is a ranged ntile
# (operators/ranking — no single-task window at any row count), the decile
# table is 10 rows, totals broadcast.
GAINS_TILES = 10

_GAIN_MICRO = (
    "CASE WHEN t_pos > 0 THEN"
    " CAST(FLOOR(CAST(CAST(cum_pos AS DECIMAL(38,0))"
    " * 1000000 AS DOUBLE) / CAST(t_pos AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)
_LIFT_MICRO = (
    "CASE WHEN t_pos > 0 AND cum_rows > 0 THEN"
    " CAST(FLOOR(CAST(CAST(cum_pos AS DECIMAL(38,0))"
    " * t_rows * 1000000 AS DOUBLE)"
    " / (CAST(cum_rows AS DOUBLE) * CAST(t_pos AS DOUBLE))"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)


def lift_gains_from_labeled(labeled: DataFrame) -> DataFrame:
    """The gains-table tail over (doc_id, y BOOLEAN, s) rows, however the
    scores were derived — shared by the batch query and the streaming ledger
    twin. Ranged ntile -> 10-row decile cells -> ranged prefix sums ->
    broadcast totals."""
    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_ntile,
        ranged_running_sum,
    )

    tiled = ranged_ntile(
        labeled,
        [F.col("s").desc(), F.col("doc_id")],
        GAINS_TILES,
        "tile",
    )
    cells = tiled.groupBy(F.col("tile").cast("bigint").alias("tile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("n_pos"),
    )
    cum = ranged_running_sum(
        ranged_running_sum(cells, ["tile"], F.col("n_rows"), "rows_below"),
        ["tile"],
        F.col("n_pos"),
        "pos_below",
    ).selectExpr(
        "tile",
        "n_rows",
        "n_pos",
        "rows_below + n_rows AS cum_rows",
        "pos_below + n_pos AS cum_pos",
    )
    tot = cells.agg(
        F.sum("n_rows").cast("bigint").alias("t_rows"),
        F.sum("n_pos").cast("bigint").alias("t_pos"),
    )
    return cum.crossJoin(F.broadcast(tot)).selectExpr(
        "tile",
        "n_rows",
        "n_pos",
        "cum_rows",
        "cum_pos",
        f"{_GAIN_MICRO} AS gain_micro",
        f"{_LIFT_MICRO} AS lift_micro",
    )


def q_feat_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance

    d = load(spark, sf_dir, "documents")
    w = dsir_importance(
        d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    )
    labeled = (
        d.select("doc_id", (F.col("lang") == "en").alias("y"))
        .join(w, "doc_id")
        .select("doc_id", "y", F.col("logw_micro").alias("s"))
    )
    return lift_gains_from_labeled(labeled)


def _lift_gains_oracle() -> str:
    return f"""
WITH {_dsir_w_ctes()},
labeled AS (
  SELECT w.doc_id, w.logw_micro AS s, d.lang = 'en' AS y
  FROM w JOIN documents d USING (doc_id)
),
tiled AS (
  SELECT doc_id, s, y,
         NTILE({GAINS_TILES}) OVER (ORDER BY s DESC, doc_id) AS tile
  FROM labeled
),
cells AS (
  SELECT CAST(tile AS BIGINT) AS tile,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
  FROM tiled GROUP BY 1
),
cum AS (
  SELECT tile, n_rows, n_pos,
         CAST(COALESCE(SUM(n_rows) OVER (ORDER BY tile
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           + n_rows AS cum_rows,
         CAST(COALESCE(SUM(n_pos) OVER (ORDER BY tile
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           + n_pos AS cum_pos
  FROM cells
),
tot AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS t_rows,
         CAST(SUM(n_pos) AS BIGINT) AS t_pos
  FROM cells
)
SELECT tile, n_rows, n_pos, cum_rows, cum_pos,
       {_GAIN_MICRO} AS gain_micro,
       {_LIFT_MICRO} AS lift_micro
FROM cum CROSS JOIN tot
"""


QUERIES["feat_lift_gains"] = QuerySpec(q_feat_lift_gains, _lift_gains_oracle())


# -- split-conformal threshold + coverage audit (r13) -------------------------------------
# The distribution-free uncertainty wrapper the modern evaluation stack puts
# AROUND any classifier (Vovk et al.; Angelopoulos & Bates 2022): on a held
# calibration half, take the ⌈(n+1)(1−α)⌉-th smallest nonconformity score
# (here the absolute probability residual |1e6·y − mu|, an exact integer);
# on the disjoint test half, the share of rows whose score falls within that
# threshold is guaranteed ≥ 1−α in expectation under exchangeability — with
# NO assumption the sigmoid is calibrated. The query publishes the
# threshold, its rank, and the measured test coverage next to the 1−α
# target, so the guarantee is an oracle-checked row, not a claim.
# Determinism: the split is orderkey parity; the order statistic is picked
# under the (score, k) total order so both engines name the same row; the
# rank ⌈0.9·(n+1)⌉ is exact integer arithmetic through the shared
# FLOOR((9(n+1)+9)/10) spell. Scale shape: the IRLS fit + one scoring scan;
# the calibration rank runs through the range-partitioned row number (no
# single-task window at any calibration size); coverage is one conditional
# fold; readout one row.
CONFORMAL_ALPHA_PCT = 10  # α = 0.10 → 90% target coverage

_CONF_Q_RANK = (
    "CAST(FLOOR((CAST(9 * (n_cal + 1) AS DOUBLE) + CAST(9 AS DOUBLE))"
    " / CAST(10 AS DOUBLE)) AS BIGINT)"
)
_CONF_COVERAGE_MICRO = (
    "CASE WHEN n_test > 0 THEN"
    " CAST(FLOOR(CAST(n_covered AS DOUBLE) * CAST(1000000 AS DOUBLE)"
    " / CAST(n_test AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)


def q_feat_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_row_number,
    )

    scored = (
        _logreg_scored(spark, sf_dir)
        .selectExpr(
            "k",
            "ABS(1000000 * y - mu_micro) AS r",
            "k % 2 = 0 AS is_cal",
        )
        .localCheckpoint(eager=False)
    )
    cal = scored.filter(F.col("is_cal"))
    n_cal = cal.agg(F.count(F.lit(1)).cast("bigint").alias("n_cal"))
    ranked = ranged_row_number(cal, [F.col("r"), F.col("k")], "rn")
    q = (
        ranked.crossJoin(F.broadcast(n_cal))
        .filter(F.expr(f"rn = {_CONF_Q_RANK}"))
        .selectExpr("n_cal", "rn AS q_rank", "r AS q_micro")
    )
    cov = (
        scored.filter(~F.col("is_cal"))
        .crossJoin(F.broadcast(q))
        .groupBy("n_cal", "q_rank", "q_micro")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(F.when(F.col("r") <= F.col("q_micro"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return cov.selectExpr(
        "n_cal",
        "n_test",
        "q_rank",
        "q_micro",
        "n_covered",
        f"{_CONF_COVERAGE_MICRO} AS coverage_micro",
        f"CAST({(100 - CONFORMAL_ALPHA_PCT) * 10_000} AS BIGINT)"
        " AS target_micro",
    )


def _conformal_oracle() -> str:
    tail = f""",
nonconf AS (
  SELECT k, ABS(1000000 * y - mu_micro) AS r, k % 2 = 0 AS is_cal
  FROM scored
),
ncal AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM nonconf WHERE is_cal
),
ranked AS (
  SELECT r, CAST(ROW_NUMBER() OVER (ORDER BY r, k) AS BIGINT) AS rn
  FROM nonconf WHERE is_cal
),
q AS (
  SELECT n_cal, rn AS q_rank, r AS q_micro
  FROM ranked CROSS JOIN ncal
  WHERE rn = {_CONF_Q_RANK}
),
cov AS (
  SELECT n_cal, q_rank, q_micro,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN t.r <= q.q_micro THEN 1 ELSE 0 END) AS BIGINT)
           AS n_covered
  FROM nonconf t CROSS JOIN q
  WHERE NOT t.is_cal
  GROUP BY 1, 2, 3
)
SELECT n_cal, n_test, q_rank, q_micro, n_covered,
       {_CONF_COVERAGE_MICRO} AS coverage_micro,
       CAST({(100 - CONFORMAL_ALPHA_PCT) * 10_000} AS BIGINT) AS target_micro
FROM cov
"""
    return _logreg_scored_ctes() + tail


QUERIES["feat_conformal_threshold"] = QuerySpec(
    q_feat_conformal_threshold, _conformal_oracle()
)


# -- Neyman optimal stratified allocation (r13) -------------------------------------------
# The design question BEFORE any stratified sample is drawn: given a budget
# of n draws, how many should each stratum get? Proportional allocation
# wastes budget on homogeneous strata; Neyman (1934) allocation n_h ∝
# N_h·S_h is the variance-minimizing answer, and this query computes it
# EXACTLY: per-language doc counts and n_chars moments fold to exact
# integers, S_h quantizes once (one shared sqrt expression over exact
# DECIMAL(38,0) moments + the FLOOR(x+0.5) spell), the weight w_h = N_h·S_h
# stays a BIGINT, and the integer apportionment uses the largest-remainder
# (Hamilton) method — base_h = (n·w_h) DIV Σw and one extra seat to the L
# largest remainders under the (remainder DESC, lang) total order — so the
# allocations are integers that sum to the budget EXACTLY (a law test, not
# a rounding hope). All quantities are positive, so Spark's DIV and the
# oracle's // agree (the sign caveat that bit the hourly bucketing can't
# arise). Scale shape: one fact scan collapses map-side to |languages|
# moment rows; the remainder rank runs through the range-partitioned row
# number; everything downstream is broadcast-sized.
NEYMAN_BUDGET = 1000

_NEYMAN_STD_MICRO = (
    "CASE WHEN n_docs > 1 THEN"
    " CAST(FLOOR(sqrt((CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " / (CAST(n_docs AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE)))"
    " * CAST(1000000 AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)


def neyman_from_moments(facts: DataFrame) -> DataFrame:
    """The allocation tail over ADDITIVE per-stratum moment facts
    (lang, n_docs, sx, sxx), however accumulated — shared by the batch query
    and the streaming ledger twin."""
    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_row_number,
    )

    strata = facts.selectExpr(
        "lang",
        "n_docs",
        f"{_NEYMAN_STD_MICRO} AS std_micro",
    ).selectExpr(
        "lang", "n_docs", "std_micro", "n_docs * std_micro AS w_micro"
    ).localCheckpoint(eager=False)
    tot = strata.agg(F.sum("w_micro").cast("bigint").alias("tw"))
    based = (
        strata.crossJoin(F.broadcast(tot))
        .selectExpr(
            "lang",
            "n_docs",
            "std_micro",
            "w_micro",
            "CASE WHEN tw > 0 THEN"
            f" ({NEYMAN_BUDGET} * w_micro) DIV tw"
            " ELSE CAST(0 AS BIGINT) END AS base_n",
            "CASE WHEN tw > 0 THEN"
            f" ({NEYMAN_BUDGET} * w_micro) % tw"
            " ELSE CAST(0 AS BIGINT) END AS rem",
        )
        .localCheckpoint(eager=False)
    )
    left = based.agg(
        (F.lit(NEYMAN_BUDGET) - F.sum("base_n")).cast("bigint").alias("l_seats"),
        F.sum("w_micro").cast("bigint").alias("tw_check"),
    )
    ranked = ranged_row_number(
        based, [F.col("rem").desc(), F.col("lang")], "rr"
    )
    return (
        ranked.crossJoin(F.broadcast(left))
        .selectExpr(
            "lang",
            "n_docs",
            "std_micro",
            "w_micro",
            "CAST(base_n + CASE WHEN tw_check > 0 AND rr <= l_seats"
            " THEN 1 ELSE 0 END AS BIGINT) AS alloc",
        )
    )


def q_sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    facts = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("decimal(38,0)").alias("sx"),
        F.expr("SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars)").alias("sxx"),
    )
    return neyman_from_moments(facts)


Q_NEYMAN_ORACLE = f"""
WITH facts AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS DECIMAL(38,0)) AS sx,
         SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS sxx
  FROM documents GROUP BY 1
),
strata AS (
  SELECT lang, n_docs, std_micro, n_docs * std_micro AS w_micro
  FROM (SELECT lang, n_docs, {_NEYMAN_STD_MICRO} AS std_micro FROM facts)
),
tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS tw FROM strata),
based AS (
  SELECT lang, n_docs, std_micro, w_micro,
         CASE WHEN tw > 0 THEN ({NEYMAN_BUDGET} * w_micro) // tw
              ELSE CAST(0 AS BIGINT) END AS base_n,
         CASE WHEN tw > 0 THEN ({NEYMAN_BUDGET} * w_micro) % tw
              ELSE CAST(0 AS BIGINT) END AS rem
  FROM strata CROSS JOIN tot
),
leftover AS (
  SELECT CAST({NEYMAN_BUDGET} - SUM(base_n) AS BIGINT) AS l_seats,
         CAST(SUM(w_micro) AS BIGINT) AS tw_check
  FROM based
),
ranked AS (
  SELECT b.*,
         CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS BIGINT) AS rr
  FROM based b
)
SELECT lang, n_docs, std_micro, w_micro,
       CAST(base_n + CASE WHEN tw_check > 0 AND rr <= l_seats
            THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM ranked CROSS JOIN leftover
"""


QUERIES["sample_neyman_allocation"] = QuerySpec(
    q_sample_neyman_allocation, Q_NEYMAN_ORACLE
)


# -- selector agreement: Kendall tau-b on the decile grid (r13) ----------------------------
# Do the corpus's two quality signals — the DSIR target-domain selector and
# the heuristic quality score — RANK documents the same way? Pearson on raw
# scores answers a different (linearity) question; the curator's question is
# ordinal, and Kendall's tau-b is its standard answer. Exact at scale by the
# GRID identity: each doc lands in a (selector-decile, quality-decile) cell
# via two range-partitioned ntiles (the SQL-standard remainder rule, doc_id
# tiebreak), and tau-b of the binned rankings is a pure function of the
# ≤100-cell contingency table — concordant/discordant pair mass folds over
# cell PAIRS (≤ C(100,2), grain-bounded forever — never the C(n,2) doc-pair
# explosion a naive tau needs), ties come from the marginals, and every
# count is an exact DECIMAL(38,0) (pair masses are O(n²), past BIGINT at
# ~4.3e9 docs). tau_b = (C − D)/sqrt((n0 − T_x)(n0 − T_y)) resolves in one
# shared double expression + the signed FLOOR(x+0.5) spell. Scale shape:
# one DSIR scoring pass + one quality pass, two ranged ntiles, a 100-cell
# aggregate, a ≤4950-row broadcast cell self-join, 1-row readout.
RANK_TAU_TILES = 10

_TAU_B_MICRO = (
    "CASE WHEN (n0 - tx) > 0 AND (n0 - ty) > 0 THEN"
    " CAST(FLOOR(CAST(conc - disc AS DOUBLE) * CAST(1000000 AS DOUBLE)"
    " / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)


def rank_tau_from_scores(scored: DataFrame) -> DataFrame:
    """The tau-b tail over (doc_id, s1, s2) rows, however the two scores were
    derived. Two ranged ntiles -> cell table -> cell-pair fold."""
    from movie_genre_data_pipeline_spark.operators.ranking import ranged_ntile

    t = ranged_ntile(
        ranged_ntile(
            scored, [F.col("s1"), F.col("doc_id")], RANK_TAU_TILES, "bx"
        ),
        [F.col("s2"), F.col("doc_id")],
        RANK_TAU_TILES,
        "by",
    )
    cells = (
        t.groupBy(
            F.col("bx").cast("bigint").alias("bx"),
            F.col("by").cast("bigint").alias("by"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
        .localCheckpoint(eager=False)
    )
    a = cells.selectExpr("bx AS x1", "by AS y1", "n_xy AS n1")
    b = cells.selectExpr("bx AS x2", "by AS y2", "n_xy AS n2")
    cd = (
        a.join(F.broadcast(b), F.col("x2") > F.col("x1"))
        .selectExpr(
            "CASE WHEN y2 > y1 THEN CAST(n1 AS DECIMAL(38,0)) * n2"
            " ELSE CAST(0 AS DECIMAL(38,0)) END AS c_term",
            "CASE WHEN y2 < y1 THEN CAST(n1 AS DECIMAL(38,0)) * n2"
            " ELSE CAST(0 AS DECIMAL(38,0)) END AS d_term",
        )
        .agg(
            F.sum("c_term").alias("conc"),
            F.sum("d_term").alias("disc"),
        )
    )
    tx = (
        cells.groupBy("bx")
        .agg(F.sum("n_xy").cast("bigint").alias("n_x"))
        .agg(
            F.expr(
                "SUM(CAST(n_x AS DECIMAL(38,0)) * (n_x - 1) / 2)"
            ).cast("decimal(38,0)").alias("tx")
        )
    )
    ty = (
        cells.groupBy("by")
        .agg(F.sum("n_xy").cast("bigint").alias("n_y"))
        .agg(
            F.expr(
                "SUM(CAST(n_y AS DECIMAL(38,0)) * (n_y - 1) / 2)"
            ).cast("decimal(38,0)").alias("ty")
        )
    )
    tot = cells.agg(
        F.sum("n_xy").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    ).selectExpr(
        "n_docs",
        "n_cells",
        "CAST(CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1) / 2"
        " AS DECIMAL(38,0)) AS n0",
    )
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        _ACF_R_MICRO,
    )

    rho = cells.agg(
        F.sum("n_xy").cast("bigint").alias("n"),
        F.expr("SUM(CAST(n_xy AS DECIMAL(38,0)) * bx)").alias("sx"),
        F.expr("SUM(CAST(n_xy AS DECIMAL(38,0)) * by)").alias("sy"),
        F.expr("SUM(CAST(n_xy AS DECIMAL(38,0)) * bx * by)").alias("sxy"),
        F.expr("SUM(CAST(n_xy AS DECIMAL(38,0)) * bx * bx)").alias("sxx"),
        F.expr("SUM(CAST(n_xy AS DECIMAL(38,0)) * by * by)").alias("syy"),
    ).selectExpr(f"{_ACF_R_MICRO} AS grid_rho_micro")
    return (
        cd.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(rho))
        .selectExpr(
            "n_docs",
            "n_cells",
            f"{_TAU_B_MICRO} AS tau_b_micro",
            "grid_rho_micro",
        )
    )


def q_feat_rank_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.sampling import dsir_importance
    from movie_genre_data_pipeline_spark.functions.text import quality_score

    d = load(spark, sf_dir, "documents")
    w = dsir_importance(
        d, "doc_id", "text", (F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    )
    scored = (
        d.select(
            "doc_id",
            F.round(quality_score("text") * F.lit(1000000.0))
            .cast("bigint")
            .alias("s2"),
        )
        .join(w, "doc_id")
        .select("doc_id", F.col("logw_micro").alias("s1"), "s2")
    )
    return rank_tau_from_scores(scored)


def _rank_tau_oracle() -> str:
    from movie_genre_data_pipeline_spark.suite.text_queries import (
        Q_QUALITY_SCORES_ORACLE,
    )
    from movie_genre_data_pipeline_spark.suite.timeseries_queries import (
        _ACF_R_MICRO,
    )

    return f"""
WITH {_dsir_w_ctes()},
q AS ({Q_QUALITY_SCORES_ORACLE}),
joined AS (
  SELECT w.doc_id, w.logw_micro AS s1,
         CAST(ROUND(q.quality * 1000000.0) AS BIGINT) AS s2
  FROM w JOIN q ON q.doc_id = w.doc_id
),
tiled AS (
  SELECT doc_id,
         CAST(NTILE({RANK_TAU_TILES}) OVER (ORDER BY s1, doc_id) AS BIGINT)
           AS bx,
         CAST(NTILE({RANK_TAU_TILES}) OVER (ORDER BY s2, doc_id) AS BIGINT)
           AS by
  FROM joined
),
cells AS MATERIALIZED (
  SELECT bx, by, CAST(COUNT(*) AS BIGINT) AS n_xy FROM tiled GROUP BY 1, 2
),
cd AS (
  SELECT SUM(CASE WHEN b.by > a.by
             THEN CAST(a.n_xy AS DECIMAL(38,0)) * b.n_xy
             ELSE CAST(0 AS DECIMAL(38,0)) END) AS conc,
         SUM(CASE WHEN b.by < a.by
             THEN CAST(a.n_xy AS DECIMAL(38,0)) * b.n_xy
             ELSE CAST(0 AS DECIMAL(38,0)) END) AS disc
  FROM cells a JOIN cells b ON b.bx > a.bx
),
txc AS (
  SELECT CAST(SUM(CAST(n_x AS DECIMAL(38,0)) * (n_x - 1) / 2)
              AS DECIMAL(38,0)) AS tx
  FROM (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY bx)
),
tyc AS (
  SELECT CAST(SUM(CAST(n_y AS DECIMAL(38,0)) * (n_y - 1) / 2)
              AS DECIMAL(38,0)) AS ty
  FROM (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY by)
),
tot AS (
  SELECT n_docs, n_cells,
         CAST(CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1) / 2
              AS DECIMAL(38,0)) AS n0
  FROM (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM cells)
),
rho AS (
  SELECT {_ACF_R_MICRO} AS grid_rho_micro
  FROM (
    SELECT CAST(SUM(n_xy) AS BIGINT) AS n,
           SUM(CAST(n_xy AS DECIMAL(38,0)) * bx) AS sx,
           SUM(CAST(n_xy AS DECIMAL(38,0)) * by) AS sy,
           SUM(CAST(n_xy AS DECIMAL(38,0)) * bx * by) AS sxy,
           SUM(CAST(n_xy AS DECIMAL(38,0)) * bx * bx) AS sxx,
           SUM(CAST(n_xy AS DECIMAL(38,0)) * by * by) AS syy
    FROM cells)
)
SELECT n_docs, n_cells, {_TAU_B_MICRO} AS tau_b_micro, grid_rho_micro
FROM cd CROSS JOIN txc CROSS JOIN tyc CROSS JOIN tot CROSS JOIN rho
"""


QUERIES["feat_rank_tau"] = QuerySpec(q_feat_rank_tau, _rank_tau_oracle())


# -- data valuation: leave-one-source-out AUC ablation (r13) -------------------------------
# The question a corpus buyer actually asks: WHICH SOURCE is earning its
# storage — if source s had never existed, how well would the selector
# separate the target domain on everything else? For each source, the
# bucket model retrains WITHOUT s at ZERO extra corpus scans (the CV
# trick: a source's model is the global cell table minus its own
# (source, bucket) cells — additivity makes retraining a ≤|sources|·B-row
# subtraction, never a re-scan), every surviving doc re-scores under that
# complement, and the exact Mann-Whitney AUC folds per ablation through
# the shared partitioned prefix (no per-source single-task window). The
# '__full__' sentinel row carries the un-ablated baseline so every
# delta_micro (baseline − ablated: positive means the source was HELPING
# separation) is derived in-query from oracle-checked numbers. Scale
# shape: the per-ablation doc fan-out is |sources|-bounded (a dimension,
# not data — production audits a shortlist of sources the same way);
# ratios broadcast at |sources|·B rows; one corpus-sized postings join.
ABLATION_FULL = "__full__"


# Leave-one-source-out is inherently |sources|+1 model evaluations: the
# scored/labeled frames below are |sources|+1 broadcast-replicated passes
# over the postings, so total work is LINEAR in |sources| (the k=4 scale
# probe measured ratio 1.56 with |sources| fixed — linear-in-docs as the
# law predicts, see SCALE.md). At 100 TB that is fine only while |sources|
# stays O(10): a corpus keyed by thousands of fine-grained sources would
# turn this into a scan storm. Gate it the way brute_force_top_k gates its
# quadratic path (functions/similarity.py): hard-error past the bound
# unless the caller explicitly opts in — the right scale fix is coarsening
# the source key (domain → registrar, crawl → snapshot family) BEFORE
# ablating, or switching to Shapley-style sampled ablations.
ABLATION_MAX_SOURCES = 32


def auc_source_ablation_from_parts(
    docs: DataFrame,
    cells: DataFrame,
    tf: DataFrame,
    max_sources: int = ABLATION_MAX_SOURCES,
    allow_many_sources: bool = False,
) -> DataFrame:
    """The ablation tail over three additive parts — docs (doc_id, y,
    source), per-source bucket cells (source, bucket, raw_c, tgt_c),
    postings (doc_id, bucket, tf) — however accumulated (one batch scan or
    SUM-folded ledgers).

    Cost law: LINEAR in |sources| (|sources|+1 complement-model passes over
    the postings). Raises past `max_sources` unless `allow_many_sources=True`
    — see ABLATION_MAX_SOURCES. The guard count runs on the CELLS table
    (|sources|×buckets rows, never the corpus), so it is metadata-cheap."""
    b = DSIR_BUCKETS
    cells = cells.localCheckpoint(eager=False)
    docs = docs.localCheckpoint(eager=False)
    if not allow_many_sources:
        n_src = cells.select("source").distinct().count()
        if n_src > max_sources:
            raise ValueError(
                f"auc_source_ablation is linear in |sources| ({n_src} sources "
                f"> {max_sources}: that is {n_src + 1} postings passes). "
                f"Coarsen the source key before ablating, or pass "
                f"allow_many_sources=True for an explicitly budgeted run."
            )
    abls = (
        cells.select(F.col("source").alias("abl"))
        .distinct()
        .union(docs.sparkSession.createDataFrame([(ABLATION_FULL,)], "abl string"))
        .localCheckpoint(eager=False)
    )
    glob = cells.groupBy("bucket").agg(
        F.sum("raw_c").cast("bigint").alias("raw_tot"),
        F.sum("tgt_c").cast("bigint").alias("tgt_tot"),
    )
    comp = (
        glob.crossJoin(F.broadcast(abls))
        .join(
            cells.selectExpr(
                "source AS abl", "bucket", "raw_c AS r0", "tgt_c AS t0"
            ),
            ["abl", "bucket"],
            "left",
        )
        .selectExpr(
            "abl",
            "bucket",
            "raw_tot - coalesce(r0, 0) AS raw_c",
            "tgt_tot - coalesce(t0, 0) AS tgt_c",
        )
        .localCheckpoint(eager=False)
    )
    ftot = comp.groupBy("abl").agg(
        F.sum("raw_c").cast("bigint").alias("t_raw"),
        F.sum("tgt_c").cast("bigint").alias("t_tgt"),
    )
    ratios = comp.join(F.broadcast(ftot), "abl").select(
        "abl",
        "bucket",
        F.round(
            (
                F.log(
                    (F.col("tgt_c") + F.lit(1.0))
                    / (F.col("t_tgt") + F.lit(float(b)))
                )
                - F.log(
                    (F.col("raw_c") + F.lit(1.0))
                    / (F.col("t_raw") + F.lit(float(b)))
                )
            )
            * F.lit(1e6),
            0,
        )
        .cast("bigint")
        .alias("lr_micro"),
    )
    scored = (
        tf.join(F.broadcast(ratios), "bucket")
        .groupBy("abl", "doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("lr_micro")).cast("bigint").alias("logw_micro")
        )
    )
    labeled = (
        docs.crossJoin(F.broadcast(abls))
        .filter(
            (F.col("source") != F.col("abl"))
            | (F.col("abl") == ABLATION_FULL)
        )
        .join(scored, ["abl", "doc_id"], "left")
        .select(
            "abl",
            "y",
            F.coalesce("logw_micro", F.lit(0)).cast("bigint").alias("logw_micro"),
        )
    )
    groups = labeled.groupBy("abl", F.col("logw_micro").alias("s")).agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("c_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("bigint").alias("c_neg"),
    )
    sums = partitioned_mann_whitney_sums(groups, "abl").selectExpr(
        "abl",
        "n_pos",
        "n_neg",
        "n_scores",
        f"{_AUC_MICRO} AS auc_micro",
    ).localCheckpoint(eager=False)
    base = sums.filter(F.col("abl") == ABLATION_FULL).selectExpr(
        "auc_micro AS base_auc_micro"
    )
    return sums.crossJoin(F.broadcast(base)).selectExpr(
        "abl AS ablated_source",
        "n_pos",
        "n_neg",
        "n_scores",
        "auc_micro",
        "base_auc_micro - auc_micro AS delta_micro",
    )


def q_feat_auc_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.sampling import (
        dsir_postings,
        dsir_term_buckets,
    )

    d = load(spark, sf_dir, "documents")
    docs = d.selectExpr("doc_id", "lang = 'en' AS y", "source")
    terms = dsir_term_buckets(
        d, "doc_id", "text", (F.col("lang") == "en"), DSIR_BUCKETS
    ).join(d.select("doc_id", "source"), "doc_id")
    cells = terms.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("raw_c"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0))
        .cast("bigint")
        .alias("tgt_c"),
    )
    tf = dsir_postings(terms.select("doc_id", "__tgt", "bucket"))
    return auc_source_ablation_from_parts(docs, cells, tf)


def _source_ablation_oracle() -> str:
    b = DSIR_BUCKETS
    return f"""
WITH docs AS (
  SELECT doc_id, lang = 'en' AS y, source, {_TOKS} AS toks
  FROM documents
),
terms AS (
  SELECT doc_id, y, source,
         CAST(concat('0x', substring(md5(t.term), 1, 12)) AS BIGINT) % {b}
           AS bucket
  FROM docs, unnest(toks) AS t(term)
),
cells AS MATERIALIZED (
  SELECT source, bucket,
         CAST(COUNT(*) AS BIGINT) AS raw_c,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS tgt_c
  FROM terms GROUP BY 1, 2
),
abls AS (
  SELECT DISTINCT source AS abl FROM cells
  UNION ALL SELECT '{ABLATION_FULL}'
),
gcells AS (
  SELECT bucket, CAST(SUM(raw_c) AS BIGINT) AS raw_tot,
         CAST(SUM(tgt_c) AS BIGINT) AS tgt_tot
  FROM cells GROUP BY 1
),
comp AS (
  SELECT a.abl, g.bucket,
         g.raw_tot - COALESCE(c.raw_c, 0) AS raw_c,
         g.tgt_tot - COALESCE(c.tgt_c, 0) AS tgt_c
  FROM gcells g CROSS JOIN abls a
  LEFT JOIN cells c ON c.source = a.abl AND c.bucket = g.bucket
),
ftot AS (
  SELECT abl, CAST(SUM(raw_c) AS BIGINT) AS t_raw,
         CAST(SUM(tgt_c) AS BIGINT) AS t_tgt
  FROM comp GROUP BY 1
),
ratios AS (
  SELECT comp.abl, bucket,
         CAST(ROUND((LN((tgt_c + 1.0) / (t_tgt + CAST({b} AS DOUBLE)))
                   - LN((raw_c + 1.0) / (t_raw + CAST({b} AS DOUBLE))))
                    * 1000000.0, 0) AS BIGINT) AS lr_micro
  FROM comp JOIN ftot USING (abl)
),
tf AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
scored AS (
  SELECT r.abl, t.doc_id, CAST(SUM(t.tf * r.lr_micro) AS BIGINT) AS logw_micro
  FROM tf t JOIN ratios r USING (bucket)
  GROUP BY 1, 2
),
labeled AS (
  SELECT a.abl, d.y, COALESCE(s.logw_micro, 0) AS logw_micro
  FROM docs d CROSS JOIN abls a
  LEFT JOIN scored s ON s.abl = a.abl AND s.doc_id = d.doc_id
  WHERE d.source <> a.abl OR a.abl = '{ABLATION_FULL}'
),
groups AS (
  SELECT abl, logw_micro AS s,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
         CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
  FROM labeled GROUP BY 1, 2
),
cum AS (
  SELECT abl, s, c_pos, c_neg,
         CAST(COALESCE(SUM(c_neg) OVER (PARTITION BY abl ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_neg_below
  FROM groups
),
sums AS (
  SELECT abl,
         CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_neg) AS BIGINT) AS n_neg,
         CAST(COUNT(*) AS BIGINT) AS n_scores,
         SUM(CAST(c_pos AS DECIMAL(38,0))
             * (2 * cum_neg_below + c_neg)) AS u2
  FROM cum GROUP BY 1
),
final AS (
  SELECT abl, n_pos, n_neg, n_scores, {_AUC_MICRO} AS auc_micro FROM sums
),
base AS (
  SELECT auc_micro AS base_auc_micro FROM final
  WHERE abl = '{ABLATION_FULL}'
)
SELECT abl AS ablated_source, n_pos, n_neg, n_scores, auc_micro,
       base_auc_micro - auc_micro AS delta_micro
FROM final CROSS JOIN base
"""


QUERIES["feat_auc_source_ablation"] = QuerySpec(
    q_feat_auc_source_ablation, _source_ablation_oracle()
)


# -- feature drift screen: per-feature PSI between snapshots (r13) -------------------------
# The monitoring sibling of feat_leakage_screen on the TIME axis: the
# leakage screen asks "which feature predicts the label?", this asks "which
# feature's DISTRIBUTION moved between snapshots?" — the nightly per-feature
# PSI sweep a feature-store team runs before retraining (the same < 0.1 /
# 0.1–0.25 / > 0.25 triage bands as the score PSI). One stacked orders scan
# lands every feature's (feature, bin) cells with the orderkey-parity
# snapshot halves in the (cur, ref) seats (production: two snapshot dates),
# and the readout IS woe_iv_report_from_cells — PSI is IV between snapshots
# (the feat_score_psi identity), so the Laplace-smoothed exact integer
# ratios and the order-free integer fold carry over unchanged, per feature,
# ranked by drift. Scale shape: one fact scan stacked map-side into
# |features|·|bins| cells; everything after is broadcast-sized.
def drift_cell_facts(orders: DataFrame) -> DataFrame:
    """(feature, x, n_pos=cur half, n_neg=ref half) — the stacked additive
    snapshot-contingency facts over one orders scan. SUM-foldable, so the
    streaming twin appends these."""
    stack_expr = ", ".join(
        f"'{name}', {expr}" for name, expr in LEAKAGE_FEATURES
    )
    return (
        orders.selectExpr(
            f"stack({len(LEAKAGE_FEATURES)}, {stack_expr}) AS (feature, x)",
            "o_orderkey % 2 = 1 AS is_cur",
        )
        .groupBy("feature", "x")
        .agg(
            F.sum(F.when(F.col("is_cur"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
            F.sum(F.when(F.col("is_cur"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_neg"),
        )
    )


def drift_screen_from_cells(cells: DataFrame) -> DataFrame:
    """The per-feature PSI report over the stacked snapshot cells, however
    accumulated — woe_iv_report_from_cells re-seated with (cur, ref) in the
    (pos, neg) seats, columns renamed to the monitoring vocabulary."""
    return woe_iv_report_from_cells(cells).selectExpr(
        "feature",
        "n_bins",
        "n_pos AS n_cur",
        "n_neg AS n_ref",
        "iv_micro AS psi_micro",
        "woe_min_micro AS lnratio_min_micro",
        "woe_max_micro AS lnratio_max_micro",
    )


def q_feat_drift_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return drift_screen_from_cells(drift_cell_facts(o))


def _drift_screen_oracle() -> str:
    sel = "\nUNION ALL ".join(
        f"SELECT '{name}' AS feature, {expr.replace('AS STRING', 'AS VARCHAR')}"
        f" AS x, o_orderkey % 2 = 1 AS is_cur FROM orders"
        for name, expr in LEAKAGE_FEATURES
    )
    return f"""
WITH stacked AS (
{sel}
),
cells AS (
  SELECT feature, x,
         CAST(SUM(CASE WHEN is_cur THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN is_cur THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
  FROM stacked GROUP BY 1, 2
),
tot AS (
  SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_bins,
         CAST(SUM(n_pos) AS BIGINT) AS t_pos,
         CAST(SUM(n_neg) AS BIGINT) AS t_neg
  FROM cells GROUP BY 1
),
bins AS (
  SELECT feature, n_bins, t_pos, t_neg,
         {_WOE_MICRO} AS woe_micro,
         {_SHARE_MICRO.format(n="n_pos", t="t_pos")} AS pos_share_micro,
         {_SHARE_MICRO.format(n="n_neg", t="t_neg")} AS neg_share_micro
  FROM cells JOIN tot USING (feature)
),
folded AS (
  SELECT feature, MAX(n_bins) AS n_bins, MAX(t_pos) AS n_pos,
         MAX(t_neg) AS n_neg,
         SUM((pos_share_micro - neg_share_micro) * woe_micro) AS iv_sum,
         MIN(woe_micro) AS woe_min_micro,
         MAX(woe_micro) AS woe_max_micro
  FROM bins GROUP BY feature
)
SELECT feature, n_bins, n_pos AS n_cur, n_neg AS n_ref,
       {_IV_MICRO} AS psi_micro,
       woe_min_micro AS lnratio_min_micro,
       woe_max_micro AS lnratio_max_micro
FROM folded
"""


QUERIES["feat_drift_screen"] = QuerySpec(
    q_feat_drift_screen, _drift_screen_oracle()
)


# -- PPS systematic sampling (r13) ----------------------------------------------------------
# The other classical survey design next to Neyman allocation: probability-
# proportional-to-size SYSTEMATIC selection (Madow 1949) — walk the corpus
# in a fixed total order, drop n equally-spaced selection points on the
# cumulative-size axis, and a document is hit once per point inside its
# span, so inclusion probability is exactly proportional to size with NO
# randomness to reproduce. All integer arithmetic: with T = Σ sizes and n
# points, doc i (exclusive prefix cum_i, size s_i) receives
# points_i = ((cum_i + s_i)·n) DIV T − (cum_i·n) DIV T — every quantity a
# positive BIGINT (cum·n ≤ T·n stays far under 2^63 until ~9e15 total
# chars·points), DIV and // agree on positives, and Σ points_i = n is an
# IDENTITY (telescoping), pinned as a law. A document larger than the
# sampling interval legitimately absorbs multiple points (the
# with-multiplicity convention); n_sel_docs counts it once. Scale shape:
# one size projection, one range-partitioned exclusive prefix sum
# (operators/ranking — no single-task window), one |languages| roll-up.
PPS_POINTS = 1000


def pps_report_from_sizes(sizes: DataFrame) -> DataFrame:
    """The PPS tail over (doc_id, lang, sz) rows, however accumulated —
    shared by the batch query and the streaming ledger twin."""
    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_running_sum,
    )

    cum = ranged_running_sum(
        sizes, ["doc_id"], F.col("sz"), "cum_before"
    ).localCheckpoint(eager=False)
    tot = cum.agg(F.sum("sz").cast("bigint").alias("t_sz"))
    pts = cum.crossJoin(F.broadcast(tot)).selectExpr(
        "lang",
        "sz",
        f"((cum_before + sz) * {PPS_POINTS}) DIV t_sz"
        f" - (cum_before * {PPS_POINTS}) DIV t_sz AS points",
    )
    return pts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("sz").cast("bigint").alias("total_size"),
        F.sum("points").cast("bigint").alias("n_points"),
        F.sum(F.when(F.col("points") >= 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sel_docs"),
    )


def q_sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sizes = d.select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("sz")
    )
    return pps_report_from_sizes(sizes)


Q_PPS_ORACLE = f"""
WITH sizes AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS sz FROM documents
),
cum AS (
  SELECT doc_id, lang, sz,
         CAST(COALESCE(SUM(sz) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM sizes
),
tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS t_sz FROM sizes),
pts AS (
  SELECT lang, sz,
         ((cum_before + sz) * {PPS_POINTS}) // t_sz
           - (cum_before * {PPS_POINTS}) // t_sz AS points
  FROM cum CROSS JOIN tot
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(sz) AS BIGINT) AS total_size,
       CAST(SUM(points) AS BIGINT) AS n_points,
       CAST(SUM(CASE WHEN points >= 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sel_docs
FROM pts GROUP BY 1
"""


QUERIES["sample_pps_systematic"] = QuerySpec(
    q_sample_pps_systematic, Q_PPS_ORACLE
)


# -- Spearman rank-correlation matrix (r14) ------------------------------------------------
# The monotone-association screen Pearson misses: Spearman's rho is Pearson
# over AVERAGE RANKS (ties mid-ranked), robust to the heavy-tailed/
# nonlinearly-scaled features training corpora are full of. Rank discipline:
# avg-rank(v) = (#below) + (#equal+1)/2, computed as the INTEGER doubled
# rank 2·below + cnt + 1 from each column's value-grain frequency map — no
# per-row window anywhere (the rank map is |distinct values| rows, its
# exclusive prefix sum runs range-partitioned via operators/ranking.py, and
# rows collect their rank by an equi-join on the value). Doubling keeps
# every moment exact-integer; scaling both variables by 2 leaves rho
# invariant, so the published micro value IS Spearman. The Pearson tail
# reuses corr_matrix_micro / corr_pair_sql verbatim (decimal-exact moments,
# one shared double expression). Scale shape: 3 value-grain maps + 3
# equi-joins + one map-side-combined moment aggregate; at >2^31-row facts
# the doubled ranks still fit BIGINT (2n+1), though rank² products then
# want decimal-first multiplication — the corr-matrix caveat, noted there.
SPEARMAN_COLS = ("qty", "price_c", "disc_c")


def _spearman_ranked(feats: DataFrame) -> DataFrame:
    """feats(col -> bigint) with each column replaced by its doubled
    average rank."""
    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_running_sum,
    )

    out = feats
    for c in SPEARMAN_COLS:
        vals = out.groupBy(c).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        ranks = ranged_running_sum(vals, [c], F.col("cnt"), "below").select(
            c,
            (2 * F.col("below") + F.col("cnt") + 1).cast("bigint").alias(f"__r2_{c}"),
        )
        out = out.join(ranks, c)
    return out.select(
        *[F.col(f"__r2_{c}").alias(c) for c in SPEARMAN_COLS]
    )


def q_feat_spearman_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.regression import (
        corr_matrix_micro,
    )

    li = load(spark, sf_dir, "lineitem")
    feats = li.select(
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_c"),
    )
    return corr_matrix_micro(_spearman_ranked(feats), SPEARMAN_COLS)


def _spearman_oracle() -> str:
    from movie_genre_data_pipeline_spark.functions.regression import (
        corr_pair_sql,
    )

    cols = SPEARMAN_COLS
    maps = []
    for c in cols:
        maps.append(
            f"""m_{c} AS (SELECT {c} AS v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM f GROUP BY 1),
r_{c} AS (SELECT v,
  CAST(2 * COALESCE(SUM(cnt) OVER (ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1
    AS BIGINT) AS r2
  FROM m_{c})"""
        )
    joins = " ".join(f"JOIN r_{c} ON r_{c}.v = f.{c}" for c in cols)
    ranked_cols = ", ".join(f"r_{c}.r2 AS {c}" for c in cols)
    moments = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in cols:
        moments.append(f"CAST(SUM({c}) AS DOUBLE) AS s_{c}")
    for i, a in enumerate(cols):
        for b in cols[i:]:
            lo, hi = sorted((a, b))
            moments.append(
                f"CAST(SUM(CAST({a} AS HUGEINT) * {b}) AS DOUBLE) AS p_{lo}_{hi}"
            )
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    rows = "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"{corr_pair_sql(a, b)} AS corr_micro FROM g"
        for a, b in pairs
    )
    maps_sql = ",\n".join(maps)
    return f"""
WITH f AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_c
  FROM lineitem
),
{maps_sql},
ranked AS (SELECT {ranked_cols} FROM f {joins}),
g AS (SELECT {", ".join(moments)} FROM ranked)
{rows}
"""


QUERIES["feat_spearman_matrix"] = QuerySpec(
    q_feat_spearman_matrix, _spearman_oracle()
)


# -- Mahalanobis outlier screen (r14) ------------------------------------------------------
# The covariance-aware 2-D outlier audit a per-feature z-score can't do:
# squared Mahalanobis distance d² = (x−μ)ᵀ Σ⁻¹ (x−μ) under the population
# covariance, with Σ⁻¹ in closed form (2×2 — det/adjugate, no iterative
# solver). Flags rows that are individually unremarkable but jointly
# inconsistent (a cheap order, years late — the correlation carries the
# signal). Exactness: the six moments (n, Σx1, Σx2, Σx1², Σx1x2, Σx2²)
# accumulate as exact integers/DECIMAL(38,0) (squares overflow BIGINT at
# fact scale) on both engines; every double appears in ONE shared
# fixed-parenthesization expression, and d² quantizes once to micro before
# the integer bin compare (χ²₂ edges 1/4/9). Scale shape: one map-side
# combine to 6 numbers + one scoring scan against the broadcast moments —
# the screen is inherently two-pass (scores are judged under GLOBAL
# statistics); the twin ledgers the moments AND the dims, and re-judges at
# readout (the DSIR doc-ledger precedent).
_MAHA_MU1 = "(s1 / n)"
_MAHA_MU2 = "(s2 / n)"
_MAHA_C11 = f"(p11 / n - {_MAHA_MU1} * {_MAHA_MU1})"
_MAHA_C12 = f"(p12 / n - {_MAHA_MU1} * {_MAHA_MU2})"
_MAHA_C22 = f"(p22 / n - {_MAHA_MU2} * {_MAHA_MU2})"
_MAHA_DET = f"({_MAHA_C11} * {_MAHA_C22} - {_MAHA_C12} * {_MAHA_C12})"
_MAHA_D2_MICRO = (
    "CAST(FLOOR(("
    f"{_MAHA_C22} * (CAST(x1 AS DOUBLE) - {_MAHA_MU1})"
    f" * (CAST(x1 AS DOUBLE) - {_MAHA_MU1})"
    f" - CAST(2 AS DOUBLE) * {_MAHA_C12}"
    f" * (CAST(x1 AS DOUBLE) - {_MAHA_MU1})"
    f" * (CAST(x2 AS DOUBLE) - {_MAHA_MU2})"
    f" + {_MAHA_C11} * (CAST(x2 AS DOUBLE) - {_MAHA_MU2})"
    f" * (CAST(x2 AS DOUBLE) - {_MAHA_MU2})"
    f") / {_MAHA_DET} * CAST(1000000 AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_MAHA_BIN = (
    "CASE WHEN d2_micro < 1000000 THEN 'a_d2_lt_1'"
    " WHEN d2_micro < 4000000 THEN 'b_d2_1_4'"
    " WHEN d2_micro < 9000000 THEN 'c_d2_4_9'"
    " ELSE 'd_d2_ge_9' END"
)


def maha_dims(orders: DataFrame) -> DataFrame:
    """(x1, x2) exact-integer feature rows: order value in cents, order date
    in epoch days — arrival facts, the twin ledgers them as-is."""
    return orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("x1"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("x2"),
    )


def maha_moments(dims: DataFrame) -> DataFrame:
    """One additive moment row (n, s1, s2, p11, p12, p22) — SUM-foldable, the
    OLS-Gram ledger shape."""
    return dims.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(F.expr("CAST(x1 AS DECIMAL(38,0)) * x1")).alias("p11"),
        F.sum(F.expr("CAST(x1 AS DECIMAL(38,0)) * x2")).alias("p12"),
        F.sum(F.expr("CAST(x2 AS DECIMAL(38,0)) * x2")).alias("p22"),
    )


def maha_report_from_parts(dims: DataFrame, moments: DataFrame) -> DataFrame:
    """The χ²₂-binned d² histogram over (x1, x2) dims judged under folded
    global moments, however both accumulated — shared by batch and twin."""
    g = moments.selectExpr(
        "CAST(n AS DOUBLE) AS n",
        "CAST(s1 AS DOUBLE) AS s1",
        "CAST(s2 AS DOUBLE) AS s2",
        "CAST(p11 AS DOUBLE) AS p11",
        "CAST(p12 AS DOUBLE) AS p12",
        "CAST(p22 AS DOUBLE) AS p22",
    )
    scored = dims.crossJoin(F.broadcast(g)).selectExpr(
        f"{_MAHA_D2_MICRO} AS d2_micro"
    )
    return (
        scored.selectExpr(f"{_MAHA_BIN} AS d2_bin", "d2_micro")
        .groupBy("d2_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.max("d2_micro").cast("bigint").alias("max_d2_micro"),
        )
        .orderBy("d2_bin")
    )


def q_feat_mahalanobis_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    dims = maha_dims(load(spark, sf_dir, "orders"))
    return maha_report_from_parts(dims, maha_moments(dims))


Q_MAHA_ORACLE = f"""
WITH dims AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x1,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x2
  FROM orders
),
moments AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x1) AS DOUBLE) AS s1,
         CAST(SUM(x2) AS DOUBLE) AS s2,
         CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS p11,
         CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS p12,
         CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS p22
  FROM dims
),
scored AS (
  SELECT {_MAHA_D2_MICRO} AS d2_micro FROM dims CROSS JOIN moments
)
SELECT {_MAHA_BIN} AS d2_bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(d2_micro) AS BIGINT) AS max_d2_micro
FROM scored GROUP BY 1 ORDER BY 1
"""

QUERIES["feat_mahalanobis_screen"] = QuerySpec(
    q_feat_mahalanobis_screen, Q_MAHA_ORACLE
)


# -- Horvitz-Thompson estimation under the PPS design (r14) --------------------------------
# What the PPS sample is FOR: estimate a corpus total you didn't scan (here
# the token count) from only the systematically-selected docs, weighting
# each by its inverse inclusion intensity. Under sample_pps_systematic's
# design a doc of size sz at corpus total T receives points_i systematic
# hits with E[points_i] = K·sz/T, so the Hansen-Hurwitz/HT form is
# ŷ = (T/K)·Σ points_i·y_i/sz_i — unbiased, and exact-deterministic here
# because the design itself is deterministic. Per-doc ratios quantize once
# (numerators points·y·1e6 stay exact BIGINT well past fact scale, one
# double divide + half-up), the micro ratios SUM exactly as BIGINTs, and
# the final T/K unscale is one shared double expression per language.
# The per-language report publishes the estimate beside the TRUE total —
# the design-effect audit (relative error in micro) a sampling pipeline
# watches before trusting the estimator on totals it can't afford to scan.
_HT_RATIO_MICRO = (
    "CAST(FLOOR(CAST(points * y * 1000000 AS DOUBLE) / CAST(sz AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_HT_EST_TOKENS = (
    "CAST(FLOOR(CAST(t_sz AS DOUBLE) * CAST(sum_ratio AS DOUBLE)"
    f" / CAST({{K}} AS DOUBLE) / CAST(1000000 AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_HT_ERR_MICRO = (
    "CAST(FLOOR((CAST(est_tokens AS DOUBLE) - CAST(true_tokens AS DOUBLE))"
    " * CAST(1000000 AS DOUBLE) / CAST(true_tokens AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


def q_sample_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_genre_data_pipeline_spark.functions.text import tokens
    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_running_sum,
    )

    d = load(spark, sf_dir, "documents")
    sizes = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("sz"),
        F.size(tokens("text")).cast("bigint").alias("y"),
    )
    cum = ranged_running_sum(
        sizes, ["doc_id"], F.col("sz"), "cum_before"
    ).localCheckpoint(eager=False)
    tot = cum.agg(F.sum("sz").cast("bigint").alias("t_sz"))
    pts = cum.crossJoin(F.broadcast(tot)).selectExpr(
        "lang",
        "sz",
        "y",
        "t_sz",
        f"((cum_before + sz) * {PPS_POINTS}) DIV t_sz"
        f" - (cum_before * {PPS_POINTS}) DIV t_sz AS points",
    )
    facts = pts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("y").cast("bigint").alias("true_tokens"),
        F.sum(F.when(F.col("points") >= 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sampled"),
        F.sum(F.expr(f"CASE WHEN points >= 1 THEN {_HT_RATIO_MICRO} ELSE 0 END"))
        .cast("bigint")
        .alias("sum_ratio"),
        F.max("t_sz").cast("bigint").alias("t_sz"),
    )
    est = facts.selectExpr(
        "lang",
        "n_docs",
        "true_tokens",
        "n_sampled",
        _HT_EST_TOKENS.format(K=PPS_POINTS) + " AS est_tokens",
    )
    return est.selectExpr(
        "lang",
        "n_docs",
        "true_tokens",
        "n_sampled",
        "est_tokens",
        f"{_HT_ERR_MICRO} AS err_micro",
    ).orderBy("lang")


def _ht_oracle() -> str:
    return f"""
WITH sizes AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS sz,
         CAST(len({_TOKS}) AS BIGINT) AS y
  FROM documents
),
cum AS (
  SELECT doc_id, lang, sz, y,
         CAST(COALESCE(SUM(sz) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM sizes
),
tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS t_sz FROM sizes),
pts AS (
  SELECT lang, sz, y, t_sz,
         ((cum_before + sz) * {PPS_POINTS}) // t_sz
           - (cum_before * {PPS_POINTS}) // t_sz AS points
  FROM cum CROSS JOIN tot
),
facts AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(y) AS BIGINT) AS true_tokens,
         CAST(SUM(CASE WHEN points >= 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sampled,
         CAST(SUM(CASE WHEN points >= 1 THEN {_HT_RATIO_MICRO} ELSE 0 END)
           AS BIGINT) AS sum_ratio,
         CAST(MAX(t_sz) AS BIGINT) AS t_sz
  FROM pts GROUP BY 1
),
est AS (
  SELECT lang, n_docs, true_tokens, n_sampled,
         {_HT_EST_TOKENS.format(K=PPS_POINTS)} AS est_tokens
  FROM facts
)
SELECT lang, n_docs, true_tokens, n_sampled, est_tokens,
       {_HT_ERR_MICRO} AS err_micro
FROM est ORDER BY lang
"""


QUERIES["sample_horvitz_thompson"] = QuerySpec(
    q_sample_horvitz_thompson, _ht_oracle()
)


# -- isotonic calibration via PAV's minimax identity (r14) ---------------------------------
# The calibration FIXER next to the reliability diagram's auditor: isotonic
# regression of the observed label rate on the model score — the standard
# nonparametric recalibration map (sklearn's isotonic; Zadrozny-Elkan 2002).
# The pool-adjacent-violators solution has an exact closed form,
#   f(i) = max_{j<=i} min_{k>=i} avg(y over bins j..k),
# and on the SCORE-DECILE grain (<= 11 bins, the calibration report's own
# axis) that minimax is a few-hundred-combination join — grain-bounded like
# the chi² grid, never corpus-quadratic. Exactness: bin facts are exact
# integers; prefix sums run range-partitioned (house rule, even at this
# grain); every block average is ONE double divide of exact ints (identical
# both engines, MIN/MAX order-free); the fitted value quantizes once at
# publish. The law tests pin monotonicity and equality with a pure-python
# PAV. Scale shape: one scored scan collapses map-side to <=11 bin rows;
# everything after is bin-grain.
_ISO_MICRO = (
    "CAST(FLOOR(iso_raw * CAST(1000000 AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


def isotonic_from_bins(bins: DataFrame) -> DataFrame:
    """The PAV minimax over (bin, n_rows, sum_y) facts, however accumulated —
    shared by batch and the ledger twin. Returns one nondecreasing fitted
    rate per bin beside the raw observed rate."""
    from movie_genre_data_pipeline_spark.operators.ranking import (
        ranged_running_sum,
    )

    pre = ranged_running_sum(bins, ["bin"], F.col("n_rows"), "cn_excl")
    pre = ranged_running_sum(pre, ["bin"], F.col("sum_y"), "cy_excl").selectExpr(
        "bin",
        "n_rows",
        "sum_y",
        "cn_excl",
        "cy_excl",
        "cn_excl + n_rows AS cn",
        "cy_excl + sum_y AS cy",
    ).localCheckpoint(eager=False)
    j = pre.selectExpr(
        "bin AS j_bin", "cn_excl AS j_cn_excl", "cy_excl AS j_cy_excl"
    )
    k = pre.selectExpr("bin AS k_bin", "cn AS k_cn", "cy AS k_cy")
    pairs = j.join(k, F.col("j_bin") <= F.col("k_bin")).selectExpr(
        "j_bin",
        "k_bin",
        "CAST(k_cy - j_cy_excl AS DOUBLE) / CAST(k_cn - j_cn_excl AS DOUBLE)"
        " AS avg_jk",
    )
    i = pre.selectExpr("bin AS i_bin")
    inner = (
        i.join(
            pairs,
            (F.col("j_bin") <= F.col("i_bin")) & (F.col("k_bin") >= F.col("i_bin")),
        )
        .groupBy("i_bin", "j_bin")
        .agg(F.min("avg_jk").alias("m"))
    )
    fit = inner.groupBy("i_bin").agg(F.max("m").alias("iso_raw"))
    return (
        bins.join(fit, bins["bin"] == fit["i_bin"])
        .selectExpr(
            "bin",
            "n_rows",
            f"{_CAL_OBS_RATE} AS obs_rate_micro",
            f"{_ISO_MICRO} AS iso_micro",
        )
        .orderBy("bin")
    )


def _cal_bins(scored: DataFrame) -> DataFrame:
    """(bin, n_rows, sum_y) — the additive calibration facts on the score-
    decile axis (the reliability diagram's own binning); the twin appends
    these."""
    return scored.groupBy(
        F.expr("mu_micro DIV 100000").cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("y").cast("bigint").alias("sum_y"),
    )


def q_feat_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return isotonic_from_bins(_cal_bins(_logreg_scored(spark, sf_dir)))


def _isotonic_oracle() -> str:
    tail = f""",
bins AS (
  SELECT CAST(mu_micro // 100000 AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(y) AS BIGINT) AS sum_y
  FROM scored GROUP BY 1
),
pre AS (
  SELECT bin, n_rows, sum_y,
         CAST(COALESCE(SUM(n_rows) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cn_excl,
         CAST(COALESCE(SUM(sum_y) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cy_excl,
         CAST(SUM(n_rows) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
         CAST(SUM(sum_y) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cy
  FROM bins
),
pairs AS (
  SELECT j.bin AS j_bin, k.bin AS k_bin,
         CAST(k.cy - j.cy_excl AS DOUBLE) / CAST(k.cn - j.cn_excl AS DOUBLE)
           AS avg_jk
  FROM pre j JOIN pre k ON j.bin <= k.bin
),
inner_min AS (
  SELECT i.bin AS i_bin, p.j_bin, MIN(p.avg_jk) AS m
  FROM pre i JOIN pairs p ON p.j_bin <= i.bin AND p.k_bin >= i.bin
  GROUP BY 1, 2
),
fit AS (
  SELECT i_bin, MAX(m) AS iso_raw FROM inner_min GROUP BY 1
)
SELECT b.bin, b.n_rows,
       {_CAL_OBS_RATE} AS obs_rate_micro,
       {_ISO_MICRO} AS iso_micro
FROM bins b JOIN fit ON fit.i_bin = b.bin
ORDER BY b.bin
"""
    return _logreg_scored_ctes() + tail


QUERIES["feat_isotonic_calibration"] = QuerySpec(
    q_feat_isotonic_calibration, _isotonic_oracle()
)
