"""Data-layout queries: Morton/Z-order clustering stats over `lineitem`.

`layout_zorder_stats` ranks (l_partkey, l_suppkey) onto a 2^16 grid, Morton-
interleaves the bits, splits z-space into equal-width ranges (the file
boundaries a z-order layout exposes), and reports each range's min/max on BOTH
dimensions — the exact statistics parquet would expose for pruning. Narrow
per-bucket ranges on both columns are the measurable payoff of the layout.

Bucketing is equi-WIDTH in z-space (bucket = z * N // 2^32) rather than
equi-count (ntile): equal-count needs a global total order — a single-task
window sort at any scale — while the equi-width split is a pure per-row integer
expression, keeping the whole query scan → project → hash-aggregate with
map-side combine. Equal-COUNT files are still produced by `write_zordered`,
whose repartitionByRange does the same job with sampled bounds instead of a
global sort.

The oracle rebuilds the identical z-values in SQL: the grid ranking is
integer-exact ((v-min)*65535 // (max-min)) and the bit-spreading chain uses the
same shift/mask constants as `operators/layout.py`, so every z and every bucket
matches bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.operators.layout import (
    _SPREAD_STEPS,
    with_zvalue,
)
from movie_genre_data_pipeline_spark.suite import QuerySpec, load

N_BUCKETS = 64


def q_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    z = with_zvalue(li, "l_partkey", "l_suppkey", out_col="z")
    # Equi-width z-range id: pure per-row integer math (z < 2^32, so the
    # product stays far below 2^63). True integer division (`div`) keeps the
    # whole computation in BIGINT. Empty ranges simply produce no row.
    bucket = F.call_function("div", F.col("z") * N_BUCKETS, F.lit(1 << 32))
    return (
        z.withColumn("bucket", bucket.cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("l_partkey").cast("bigint").alias("pk_min"),
            F.max("l_partkey").cast("bigint").alias("pk_max"),
            F.min("l_suppkey").cast("bigint").alias("sk_min"),
            F.max("l_suppkey").cast("bigint").alias("sk_max"),
            F.min("z").cast("bigint").alias("z_min"),
            F.max("z").cast("bigint").alias("z_max"),
        )
    )


def _spread_ctes() -> tuple[str, str, int]:
    """CTE chain applying the shift/mask spreading steps to gx/gy columns."""
    steps = []
    prev = "g"
    for n, (shift, mask) in enumerate(_SPREAD_STEPS):
        src_x = "(gx & 65535)" if n == 0 else f"x{n - 1}"
        src_y = "(gy & 65535)" if n == 0 else f"y{n - 1}"
        steps.append(
            f"s{n} AS (SELECT *,"
            f" (({src_x} | ({src_x} << {shift})) & {mask}) AS x{n},"
            f" (({src_y} | ({src_y} << {shift})) & {mask}) AS y{n}"
            f" FROM {prev})"
        )
        prev = f"s{n}"
    return ",\n".join(steps), prev, len(_SPREAD_STEPS) - 1


_CTES, _LAST, _N = _spread_ctes()
Q_ZORDER_ORACLE = f"""
WITH stats AS (
  SELECT MIN(l_partkey) AS xmin, MAX(l_partkey) AS xmax,
         MIN(l_suppkey) AS ymin, MAX(l_suppkey) AS ymax
  FROM lineitem
),
g AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         CASE WHEN xmax <= xmin THEN 0
              ELSE ((l_partkey - xmin) * 65535) // (xmax - xmin) END AS gx,
         CASE WHEN ymax <= ymin THEN 0
              ELSE ((l_suppkey - ymin) * 65535) // (ymax - ymin) END AS gy
  FROM lineitem CROSS JOIN stats
),
{_CTES},
z AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         (x{_N} | (y{_N} << 1)) AS z
  FROM {_LAST}
),
b AS (
  SELECT *, CAST((z * {N_BUCKETS}) // {1 << 32} AS BIGINT) AS bucket FROM z
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(l_partkey) AS BIGINT) AS pk_min,
       CAST(MAX(l_partkey) AS BIGINT) AS pk_max,
       CAST(MIN(l_suppkey) AS BIGINT) AS sk_min,
       CAST(MAX(l_suppkey) AS BIGINT) AS sk_max,
       CAST(MIN(z) AS BIGINT) AS z_min,
       CAST(MAX(z) AS BIGINT) AS z_max
FROM b GROUP BY bucket
"""


QUERIES: dict[str, QuerySpec] = {
    "layout_zorder_stats": QuerySpec(q_zorder_stats, Q_ZORDER_ORACLE),
}


# -- the skipping RATIO: why z-order beats a linear sort for 2-D predicates (r6) --------
N_FILES = 64
_PK_LO, _PK_HI = 50, 250
_SK_LO, _SK_HI = 5, 40


def q_skipping_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified data skipping: lay the same table out as N_FILES files two
    ways — globally sorted by l_partkey (linear) vs by Morton z-value
    (z-order) — compute each file's min/max footer stats, and count how many
    files each of THREE predicates must read under each layout:

    - pk_only: the linear layout's best case (its sort column);
    - sk_only: the linear layout's worst case — the second column scatters
      across every file, so min/max stats prune nothing; z-order bounds both
      dimensions per file and keeps pruning;
    - box (pk AND sk): the 2-D case z-ordering exists for.

    Six rows (layout × predicate) of (n_files, files_read) — the measured
    form of the SCALE.md claim. File assignment simulates what a
    range-partitioned sorted write produces — and since r10 it USES that
    plan: operators/ranking.ranged_ntile (range shuffle + local ranks +
    broadcast offsets, bit-identical to ntile over the total order) instead
    of a single-task NTILE window (VERDICT r9 #4). The oracle replays
    assignment, footer stats, and the pruning decision exactly."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    z = with_zvalue(li, "l_partkey", "l_suppkey", out_col="z")

    from pyspark.sql import Window

    pk_hit = (F.col("pk_min") <= _PK_HI) & (F.col("pk_max") >= _PK_LO)
    sk_hit = (F.col("sk_min") <= _SK_HI) & (F.col("sk_max") >= _SK_LO)
    preds = [("box", pk_hit & sk_hit), ("pk_only", pk_hit), ("sk_only", sk_hit)]

    from movie_genre_data_pipeline_spark.operators.ranking import ranged_ntile

    def layout(df, order_cols, name):
        files = ranged_ntile(df, order_cols, N_FILES, "file_id")
        stats = files.groupBy("file_id").agg(
            F.min("l_partkey").alias("pk_min"),
            F.max("l_partkey").alias("pk_max"),
            F.min("l_suppkey").alias("sk_min"),
            F.max("l_suppkey").alias("sk_max"),
        )
        per_pred = [
            stats.agg(
                F.lit(name).alias("layout"),
                F.lit(pname).alias("predicate"),
                F.count(F.lit(1)).cast("bigint").alias("n_files"),
                F.sum(F.when(cond, 1).otherwise(0))
                .cast("bigint")
                .alias("files_read"),
            )
            for pname, cond in preds
        ]
        out = per_pred[0]
        for frame in per_pred[1:]:
            out = out.unionByName(frame)
        return out

    lin = layout(z, [F.col("l_partkey"), "l_orderkey", "l_linenumber"], "linear")
    zo = layout(z, [F.col("z"), "l_orderkey", "l_linenumber"], "zorder")
    return lin.unionByName(zo).orderBy("layout", "predicate")


Q_SKIPPING_RATIO_ORACLE = f"""
WITH stats AS (
  SELECT MIN(l_partkey) AS xmin, MAX(l_partkey) AS xmax,
         MIN(l_suppkey) AS ymin, MAX(l_suppkey) AS ymax
  FROM lineitem
),
g AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         CASE WHEN xmax <= xmin THEN 0
              ELSE ((l_partkey - xmin) * 65535) // (xmax - xmin) END AS gx,
         CASE WHEN ymax <= ymin THEN 0
              ELSE ((l_suppkey - ymin) * 65535) // (ymax - ymin) END AS gy
  FROM lineitem CROSS JOIN stats
),
{_CTES},
z AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         (x{_N} | (y{_N} << 1)) AS z
  FROM {_LAST}
),
assigned AS (
  SELECT l_partkey, l_suppkey,
         NTILE({N_FILES}) OVER (ORDER BY l_partkey, l_orderkey, l_linenumber)
           AS f_lin,
         NTILE({N_FILES}) OVER (ORDER BY z, l_orderkey, l_linenumber) AS f_z
  FROM z
),
per_file AS (
  SELECT 'linear' AS layout, f_lin AS file_id,
         MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
         MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
  FROM assigned GROUP BY 2
  UNION ALL
  SELECT 'zorder', f_z,
         MIN(l_partkey), MAX(l_partkey), MIN(l_suppkey), MAX(l_suppkey)
  FROM assigned GROUP BY 2
),
hits AS (
  SELECT layout,
         (pk_min <= {_PK_HI} AND pk_max >= {_PK_LO}) AS pk_hit,
         (sk_min <= {_SK_HI} AND sk_max >= {_SK_LO}) AS sk_hit
  FROM per_file
)
SELECT layout, predicate,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS files_read
FROM (
  SELECT layout, 'box' AS predicate, (pk_hit AND sk_hit) AS hit FROM hits
  UNION ALL SELECT layout, 'pk_only', pk_hit FROM hits
  UNION ALL SELECT layout, 'sk_only', sk_hit FROM hits
)
GROUP BY layout, predicate
ORDER BY layout, predicate
"""


QUERIES["layout_skipping_ratio"] = QuerySpec(q_skipping_ratio, Q_SKIPPING_RATIO_ORACLE)


COMPACT_TARGET_BYTES = 2000


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table-maintenance decision: pack each source's document "files" into
    ~target-sized output bins, in insertion order, per partition value — the
    plan half of operators/compact.py's compact_parquet_dir (which is the
    physical rewrite, pytest-gated in tests/test_compact.py). One window + one
    hash aggregate, parallel across partition values."""
    from movie_genre_data_pipeline_spark.operators.compact import (
        plan_compaction_bins,
    )

    docs = load(spark, sf_dir, "documents")
    return plan_compaction_bins(
        docs,
        size_col="n_chars",
        order_col="doc_id",
        target_bytes=COMPACT_TARGET_BYTES,
        partition_col="source",
    )


Q_COMPACTION_PLAN_ORACLE = f"""
WITH binned AS (
  SELECT source, doc_id, n_chars,
         CAST(COALESCE(SUM(CAST(n_chars AS BIGINT)) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {COMPACT_TARGET_BYTES} AS BIGINT) AS bin_id
  FROM documents
)
SELECT source, bin_id, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS bin_bytes,
       MIN(doc_id) AS first_file, MAX(doc_id) AS last_file
FROM binned GROUP BY source, bin_id
"""


QUERIES["ops_compaction_plan"] = QuerySpec(q_compaction_plan, Q_COMPACTION_PLAN_ORACLE)
