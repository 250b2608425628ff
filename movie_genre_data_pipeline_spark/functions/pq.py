"""Product quantization (PQ) for approximate nearest neighbor — the memory-side
scale path of the similarity family (Jégou, Douze, Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

Where IVF (functions/kmeans.py) prunes WHICH vectors a query compares against,
PQ compresses WHAT is stored and HOW MUCH each comparison costs: each d-dim
vector is split into m subvectors, each subvector replaced by the id of its
nearest centroid from a per-subspace codebook of k codes — m·log2(k) bits per
vector instead of 4·d bytes (64-dim float32 → 1.5 bytes at m=4,k=8; production
shapes like m=16,k=256 give 16 bytes for 768-dim, a 192× compression). Search
uses ASYMMETRIC DISTANCE (ADC): the query stays exact, a per-query m×k distance
table is computed once, and each candidate's distance is m table lookups — no
per-pair float folds over d dims.

Spark shape / 100 TB notes:
- Training runs the exact-arithmetic Lloyd loop (kmeans.kmeans_fit_exact) once
  per subspace on quantized integral subvectors; codebooks are m·k·(d/m)
  doubles on the driver (tiny, broadcast as plan literals). At 100 TB you train
  on a sample (codebooks need ~100k vectors, not the corpus) and encode the
  full corpus with the frozen codebooks — encoding is a pure projection, no
  shuffle, and the encoded table is ~100-200× smaller than the vectors.
- `pq_encode` output is the thing you persist: the corpus compressed to
  (id, m small ints). Re-ranking / scans read THIS, not the raw vectors.
- `pq_adc_scores` scans every code row per query (that is PQ's contract: cheap
  exhaustive scan of a compressed corpus, each pair costing m lookups instead
  of d multiplies). For sub-linear candidate counts compose with IVF: restrict
  the pair join to the query's coarse cell (IVFADC) exactly as
  `brute_force_top_k(partition_col=...)` does for exact vectors.

Determinism contract (what makes the suite's `sim_pq_recall` fully
SQL-oracle-able, mirroring kmeans_fit_exact): inputs are quantized to integral
doubles (round(x·scale)) whose cluster sums are exact in IEEE arithmetic
regardless of accumulation order; centroids are one division each; every
distance is a sequential index-order fold over identical operands; argmin ties
break toward the lower code / lower neighbor id; the ADC sum over subspaces is
a fixed left-to-right chain d_0 + d_1 + ... + d_{m-1}. DuckDB replays all of it
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.kmeans import (
    _cent_lit,
    _sq_dist_col,
    kmeans_fit_exact,
)


def _check_geometry(dim: int, m: int) -> int:
    if m < 1 or dim % m != 0:
        raise ValueError(f"m must divide dim: dim={dim}, m={m}")
    return dim // m


def subvector(vec_col, j: int, dsub: int):
    """1-based slice of subspace j: elements j*dsub+1 .. (j+1)*dsub."""
    return F.slice(vec_col, j * dsub + 1, dsub)


def pq_train_exact(
    quantized: DataFrame, dim: int, m: int, k: int, iterations: int
) -> list[list[list[float]]]:
    """Per-subspace codebooks from the exact-arithmetic Lloyd loop.

    `quantized` is kmeans.quantize_vectors output (vid, vq) — integral-double
    vectors. Returns m codebooks of k centroids of d/m doubles each. Train on a
    sample at scale; the loop collects only k·(d/m) doubles per iteration.

    Shape note (measured r6): a fused all-subspaces-in-one-job variant
    (explode to (j, subvector), one (j, code) aggregate per iteration) was
    tried and is SLOWER here — the explode multiplies shuffled rows by m,
    which costs more than the m-fold job-scheduling overhead it saves. The
    per-subspace loops each run join-free (kmeans_fit_exact computes
    assignment inline), so an iteration is one projection + one k-key
    aggregate over the cached frame.
    """
    dsub = _check_geometry(dim, m)

    def fit(j: int) -> list[list[float]]:
        sub = quantized.select(
            "vid", subvector(F.col("vq"), j, dsub).alias("vq")
        )
        return kmeans_fit_exact(sub, k, iterations)

    # The m subspace fits are independent Lloyd loops whose wall-time at
    # fixture scale is driver-side job latency, not data — submit them from
    # m threads so the Spark scheduler overlaps the per-iteration jobs
    # (results are deterministic either way; order pinned by index).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=m) as pool:
        return list(pool.map(fit, range(m)))


def pq_train_local(
    rows: list[tuple[int, list[float]]],
    dim: int,
    m: int,
    k: int,
    iterations: int,
) -> list[list[list[float]]]:
    """`pq_train_exact` over an ALREADY-COLLECTED bounded training sample —
    zero Spark jobs (the FAISS protocol: codebooks train on ≤~100k sampled
    vectors; the corpus only gets the frozen-codebook encode projection).
    Bit-identical to the distributed fit by the kmeans_fit_exact_local
    contract, per subspace slice."""
    from movie_genre_data_pipeline_spark.functions.kmeans import (
        kmeans_fit_exact_local,
    )

    dsub = _check_geometry(dim, m)
    return [
        kmeans_fit_exact_local(
            [(vid, v[j * dsub : (j + 1) * dsub]) for vid, v in rows],
            k,
            iterations,
        )
        for j in range(m)
    ]


def pq_encode(
    quantized: DataFrame, codebooks: list[list[list[float]]]
) -> DataFrame:
    """(vid, codes): each vector compressed to m small ints — codes[j] is the
    nearest centroid of subspace j (ties → lower code). Pure projection:
    codebooks are plan literals, no join, no shuffle; this is the table you
    persist as the compressed corpus."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    code_cols = []
    for j, book in enumerate(codebooks):
        sub = subvector(F.col("vq"), j, dsub)
        dists = F.transform(_cent_lit(book), lambda c: _sq_dist_col(sub, c))
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)).cast("int") - 1)
        )
    return quantized.select("vid", F.array(*code_cols).alias("codes"))


def _pq_dtab(book: list[list[float]], j: int, dsub: int):
    """Per-query ADC distance table for subspace j: array of k squared
    distances from the query's j-th subvector to each code centroid.
    NOTE: the transform lambda must take exactly ONE parameter — PySpark
    treats a second parameter (even defaulted) as the element-index argument."""
    sub = subvector(F.col("vq"), j, dsub)
    return F.transform(_cent_lit(book), lambda c: _sq_dist_col(sub, c))


def pq_adc_scores(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    join_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(vid, neighbor, adc): asymmetric distance from every query to every
    encoded vector. The per-query m×k distance table is computed ONCE as array
    columns (m·k folds per query row); each pair then costs m element_at
    lookups + a fixed-order sum — the PQ speedup over a d-dim fold per pair.

    With `join_cols` empty the scan is exhaustive over `codes` by contract
    (compressed-corpus scan). Passing a cell assignment column present on BOTH
    frames (e.g. the kmeans coarse cell) restricts candidates to an equi-join
    on it — IVFADC, the standard billion-scale composition: the coarse
    quantizer prunes WHICH codes a query touches, PQ prices each touch at m
    lookups.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    q = queries.select(
        F.col("vid").alias("q_vid"),
        *[F.col(c) for c in join_cols],
        *[_pq_dtab(book, j, dsub).alias(f"dtab{j}") for j, book in enumerate(codebooks)],
    )
    b = codes.select(
        F.col("vid").alias("neighbor"),
        *[F.col(c).alias(f"__b_{c}") for c in join_cols],
        "codes",
    )
    cond = q["q_vid"] != b["neighbor"]
    for c in join_cols:
        cond = cond & (q[c] == b[f"__b_{c}"])
    pairs = q.join(b, cond)
    adc = F.element_at(F.col("dtab0"), F.col("codes")[0] + 1)
    for j in range(1, m):
        adc = adc + F.element_at(F.col(f"dtab{j}"), F.col("codes")[j] + 1)
    return pairs.select(
        F.col("q_vid").alias("vid"), "neighbor", adc.alias("adc")
    )
