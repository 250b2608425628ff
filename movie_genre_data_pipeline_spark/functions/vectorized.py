"""Arrow-batched numpy kernels for the dense-vector hot paths.

Why this module exists: Spark's higher-order array functions (``transform`` /
``zip_with`` / ``aggregate``) are evaluated INTERPRETED — they sit outside
whole-stage codegen — so a Q·n exact-recall baseline or an n·nlist coarse-cell
assignment pays microseconds per PAIR (the r8 scale audit measured the
panel-exact baseline at 5.3 s of sim_pq_ivfadc's 8.5 s at the 4× tier, and the
two-level assignment at 2.2 s). These kernels run the SAME arithmetic over
Arrow-delivered row batches in numpy instead: ~100× less per-element overhead,
identical results.

Bit-exactness contract (the driver gate compares against a DuckDB oracle with
--exact, so "close" is not enough):

- squared distances accumulate in INDEX ORDER — ``acc += (a_i - b_i)^2`` with
  ``i`` ascending, one elementwise float64 op at a time — exactly the op
  sequence of the ``zip_with``/``aggregate`` sequential fold and of DuckDB's
  ``list_aggregate(list_transform(...), 'sum')`` replay. numpy elementwise
  float64 ops are the same IEEE-754 primitives the JVM and DuckDB execute, so
  every partial is bit-identical. (A BLAS matmul would re-associate the sum —
  fine for integral inputs, wrong for centroid arithmetic — so we never use
  one on non-integral data.)
- argmin ties resolve to the LOWEST index (``np.argmin`` keeps the first
  minimum), matching ``array_position(__d, array_min(__d))`` and the oracle's
  ``ROW_NUMBER(... ORDER BY dist ASC, cluster ASC)`` rule.

Scale shape: per-batch work is vectorized C loops over executor-local Arrow
buffers; the driver only ever holds bounded state (a ≤PQ_NQ-row query panel, a
k·d centroid table — same class as the broadcast-dim collects the plan audit
allows); kernel outputs are panel-sized partials or one row per input row, so
nothing fact-sized is ever collected or re-shuffled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# -- scalar Arrow transforms (r-early; the module's original surface) ------------------
# Numeric discipline: implementations mirror their SQL oracles op-for-op
# (``np.log(1.0 + v)``, not ``np.log1p``) so both engines execute the same
# IEEE double sequence and only libm ulp noise remains, which the 6dp
# rounding in the suite queries absorbs.
#
# Return types are DataType INSTANCES, not DDL strings, on purpose: the numpy
# kernels below ship this module to executors (their mapInPandas closures
# reference module globals), and parsing a DDL string at import time needs an
# active SparkSession — which executors never have. A DataType instance keeps
# module import session-free everywhere.


@pandas_udf(DoubleType())
def log_damped_value(v: pd.Series) -> pd.Series:
    """ln(1 + value): the standard heavy-tail damping transform for a
    monetary/intensity feature column."""
    return np.log(1.0 + v)


@pandas_udf(DoubleType())
def signed_sqrt(v: pd.Series) -> pd.Series:
    """sign(x) * sqrt(|x|): variance-stabilizing transform that keeps sign."""
    return np.sign(v) * np.sqrt(np.abs(v))


def sqdist_index_fold(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n×k) squared-L2 matrix between row sets V (n×d) and C (k×d), each
    entry accumulated in ascending index order — the bit-exact numpy twin of
    ``kmeans._sq_dist_col``'s sequential zip_with/aggregate fold."""
    n, d = V.shape
    out = np.zeros((n, C.shape[0]), dtype=np.float64)
    for i in range(d):
        diff = V[:, i : i + 1] - C[None, :, i]
        out += diff * diff
    return out


def _panel_scan(
    q: DataFrame,
    panel: list[tuple[int, list[float]]],
    reduce_batch,
    out_decl: str,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The shared shell of the panel kernels (merged r12; the two consumers
    previously duplicated it): ONE corpus scan; per Arrow batch, the (B × Q)
    index-order squared-distance matrix against the driver-bounded panel with
    self-pairs masked to +inf (a panel query never counts itself as a
    neighbor); ``reduce_batch(D, pvids) -> pandas.DataFrame`` collapses each
    batch to ≤|panel| partial rows under ``out_decl``'s schema. Partials are
    panel-keyed, so callers finish with one |panel|-sized agg — nothing
    fact-sized is collected or re-shuffled."""
    pvids = np.array([int(v) for v, _ in panel], dtype=np.int64)
    P = np.array([vec for _, vec in panel], dtype=np.float64)
    vid_field = q.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            D = sqdist_index_fold(V, P)  # (B × Q)
            vids = pdf[id_col].to_numpy(dtype=np.int64)
            rows, cols = np.nonzero(vids[:, None] == pvids[None, :])
            D[rows, cols] = np.inf  # self-exclusion
            yield reduce_batch(D, pvids)

    return q.select(id_col, vec_col).mapInPandas(
        gen, schema=f"vid {vid_field}, {out_decl}"
    )


def panel_min_sqdist(
    q: DataFrame,
    panel: list[tuple[int, list[float]]],
    id_col: str = "vid",
    vec_col: str = "vq",
) -> DataFrame:
    """(vid, d_min): for each panel query (vid, vector), the EXACT minimum
    squared L2 distance to every OTHER corpus vector — the recall-measurement
    ground truth, computed as one `_panel_scan` emitting panel-sized partial
    minima per Arrow batch plus one |panel|-keyed final min. Replaces the
    broadcast-nested-loop + interpreted-fold shape that materialized Q·n
    pairs (suite/similarity_queries._pq_recall_tail pre-r9).

    Exact because the corpus is `quantize_vectors` output: integral doubles,
    pair distances integral < 2^53, so minima are order-free and equal to the
    oracle's MIN(d) bit-for-bit."""

    def reduce_batch(D, pvids):
        import pandas as pd

        partial = D.min(axis=0)
        finite = np.isfinite(partial)
        return pd.DataFrame({"vid": pvids[finite], "d": partial[finite]})

    partials = _panel_scan(q, panel, reduce_batch, "d double", id_col, vec_col)
    return partials.groupBy("vid").agg(F.min("d").alias("d_min"))


def panel_range_count(
    q: DataFrame,
    panel: list[tuple[int, list[float]]],
    r2: int,
    id_col: str = "vid",
    vec_col: str = "vq",
) -> DataFrame:
    """(vid, n_in_range): for each panel query, the EXACT count of OTHER
    corpus vectors within squared L2 distance <= r2 — the FAISS range_search
    ground truth, computed as one `_panel_scan` emitting panel-sized partial
    counts per Arrow batch plus one |panel|-keyed final SUM (counts are
    additive, so the fold is order-free by construction). Same exactness
    argument as panel_min_sqdist: quantize_vectors corpora are integral
    doubles, pair distances integral < 2^53, so every <= comparison is
    exact and the count matches the oracle bit-for-bit. Queries with zero
    in-range neighbors still emit (vid, 0) — the caller needs the full
    panel, not just covered queries."""
    r2 = float(r2)

    def reduce_batch(D, pvids):
        import pandas as pd

        return pd.DataFrame(
            {"vid": pvids, "n": (D <= r2).sum(axis=0).astype(np.int64)}
        )

    partials = _panel_scan(q, panel, reduce_batch, "n bigint", id_col, vec_col)
    return partials.groupBy("vid").agg(
        F.sum("n").cast("bigint").alias("n_in_range")
    )


def pq_encode_assign_np(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    group_iterations: int = 2,
    residual: bool = False,
) -> DataFrame:
    """(vid, cluster, codes): the fused numpy twin of
    ``assign_cells_two_level_np`` + ``pq.pq_encode`` — ONE corpus scan emits
    both the coarse-cell assignment and the PQ codes, where the separate
    frames previously met in an n ⨝ n vid equi-join (two full shuffles of
    corpus-sized rows at scale, the exact "decide with small rows" smell the
    join existed to avoid). With ``residual=True`` the codes quantize
    r = x − c(x) against the row's assigned cell centroid (FAISS IndexIVFPQ)
    — the subtraction is one elementwise IEEE float64 op per component,
    bit-identical to the ``zip_with(a-b)`` recenter it replaces.

    Bit-exactness: cluster follows the two-level argmin rule of
    ``assign_cells_two_level_np`` (same helper, same folds); each subspace
    code is the first-minimum index over the codebook's squared distances,
    accumulated in index order — ``np.argmin`` keeps the first minimum,
    matching ``array_position(dists, array_min(dists)) - 1`` with ties to
    the lower code."""
    from movie_genre_data_pipeline_spark.functions.kmeans import two_level_index

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    gc, gids, gcvs = two_level_index(centroids, group_iterations)
    GC = np.array(gc, dtype=np.float64)
    GIDS = [np.array(ids, dtype=np.int64) for ids in gids]
    GCVS = [np.array(cvs, dtype=np.float64) for cvs in gcvs]
    BOOKS = [np.array(book, dtype=np.float64) for book in codebooks]
    CENTS = np.array(centroids, dtype=np.float64)
    vid_field = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            gp = np.argmin(sqdist_index_fold(V, GC), axis=1)
            cluster = np.empty(len(V), dtype=np.int64)
            for gi in range(len(GIDS)):
                mask = gp == gi
                if not mask.any():
                    continue
                sub = np.argmin(sqdist_index_fold(V[mask], GCVS[gi]), axis=1)
                cluster[mask] = GIDS[gi][sub]
            E = V - CENTS[cluster] if residual else V
            codes = np.empty((len(V), m), dtype=np.int32)
            for j in range(m):
                D = sqdist_index_fold(E[:, j * dsub : (j + 1) * dsub], BOOKS[j])
                codes[:, j] = np.argmin(D, axis=1)
            yield pd.DataFrame(
                {
                    "vid": pdf[id_col].to_numpy(),
                    "cluster": cluster.astype(np.int32),
                    "codes": list(codes),
                }
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
    ).mapInPandas(gen, schema=f"vid {vid_field}, cluster int, codes array<int>")


def assign_cells_two_level_np(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    group_iterations: int = 2,
) -> DataFrame:
    """(vid, cluster): the numpy twin of ``kmeans.assign_clusters_two_level``
    — argmin over the ~√nlist group centers, then argmin over only that
    group's cells, ties to the lower index at both levels. Same hierarchical
    rule, same grouping (``two_level_index`` runs driver-side in both), same
    index-order distance folds, so the output is bit-identical to the
    expression form (pinned in tests/test_vectorized.py) and to the oracle's
    two-level CTE tail — only the physical evaluation changes, from
    interpreted per-element lambdas to one vectorized scan."""
    from movie_genre_data_pipeline_spark.functions.kmeans import two_level_index

    gc, gids, gcvs = two_level_index(centroids, group_iterations)
    GC = np.array(gc, dtype=np.float64)
    GIDS = [np.array(ids, dtype=np.int64) for ids in gids]
    GCVS = [np.array(cvs, dtype=np.float64) for cvs in gcvs]
    vid_field = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            gp = np.argmin(sqdist_index_fold(V, GC), axis=1)
            cluster = np.empty(len(V), dtype=np.int64)
            for gi in range(len(GIDS)):
                mask = gp == gi
                if not mask.any():
                    continue
                sub = np.argmin(sqdist_index_fold(V[mask], GCVS[gi]), axis=1)
                cluster[mask] = GIDS[gi][sub]
            yield pd.DataFrame(
                {"vid": pdf[id_col].to_numpy(), "cluster": cluster.astype(np.int32)}
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
    ).mapInPandas(gen, schema=f"vid {vid_field}, cluster int")
