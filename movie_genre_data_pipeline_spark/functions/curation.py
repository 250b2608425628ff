"""Corpus-curation operators for LLM training-data pipelines (north star):
benchmark decontamination, document chunking, PII redaction, and Gopher-style
repetition/quality profiling.

These extend the reference's cleanse/quarantine stage (operations/operations.py's
clean/quarantine split) to the operations a 100 TB text corpus actually needs
before training. Scale design:

- Decontamination is a bucketed equi-join on shingle digests: the benchmark side
  is always tiny relative to the corpus (thousands of eval docs vs billions of
  training docs), so it broadcasts; the corpus side is one scan + one explode.
  Never an all-pairs comparison.
- Chunking is a per-row position-explode (same shape as `dedup.shingle_rows`):
  linear in output tokens, zero shuffle, scan-pipelined.
- Redaction is pure `regexp_replace`/`regexp_count` column expressions —
  JVM-side, whole-stage-codegen'd, no UDFs.
- The repetition profile is one explode + two hash aggregations keyed by
  (doc, token) then doc — linear, map-side-combined, no window over raw tokens.

Hash/number discipline matches the rest of the engine: md5 for anything compared
across engines, ratios rounded to 6dp before any threshold/flag so float noise
cannot flip a boolean between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.dedup import shingle_rows
from movie_genre_data_pipeline_spark.functions.text import tokens

# -- PII redaction ----------------------------------------------------------------
# Conservative ASCII patterns that mean the same thing to Java regex (Spark) and
# RE2 (DuckDB): no lookaround, no \p classes.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
PII_REPLACEMENT = "[PII]"


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-pattern match counts (bigint) — audit columns for a redaction pass."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(c, F.lit(pat)).cast("bigint")
        for name, pat in PII_PATTERNS.items()
    }


def redact_pii(col: str | Column) -> Column:
    """Replace every PII match with the fixed placeholder. Patterns are applied
    in a fixed order (email → phone → ipv4) so the output is deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, PII_REPLACEMENT)
    return out


# -- chunking ---------------------------------------------------------------------
def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 32,
    stride: int = 24,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split documents into overlapping token windows (the context-window
    chunking op): chunks start at token 1, 1+stride, 1+2*stride, ...

    A non-first chunk is kept only if it contributes tokens past the previous
    chunk's end (start + window - stride <= n_tokens) — so a short tail that is
    fully contained in the prior chunk is dropped, matching how retrieval /
    pretraining chunkers avoid duplicate tails.

    Output: (doc_id, chunk_id, chunk_start, n_chunk_tokens, chunk_text).
    chunk_id = (start-1)/stride — derivable from the start, so no ordinal
    bookkeeping survives the explode. Position-explode shape: the generator is a
    cheap integer sequence; the text is sliced AFTER the explode (see
    dedup.shingle_rows for why — O(n) not O(n^2) per doc)."""
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError(f"need 0 < stride <= window, got {stride=} {window=}")
    extras = [F.col(c) for c in extra_cols]
    toks = df.select(
        F.col(id_col).alias("doc_id"), *extras, tokens(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(F.col("__n"), F.lit(1)), F.lit(stride)),
        lambda s: (s == 1) | (s + F.lit(window - stride) <= F.col("__n")),
    )
    return (
        toks.filter(F.col("__n") > 0)
        .select("doc_id", *extra_cols, "__toks", "__n", F.explode(starts).alias("__s"))
        .select(
            "doc_id",
            *extra_cols,
            ((F.col("__s") - 1) / F.lit(stride)).cast("bigint").alias("chunk_id"),
            F.col("__s").cast("bigint").alias("chunk_start"),
            F.least(F.lit(window), F.col("__n") - F.col("__s") + 1)
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.concat_ws(" ", F.slice("__toks", F.col("__s"), F.lit(window))).alias(
                "chunk_text"
            ),
        )
    )


# -- repetition / Gopher-style quality profile -------------------------------------
def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token-repetition statistics (the Gopher repetition rules'
    input features): token count, distinct-token count, type-token ratio, the
    most-frequent token's share, and a length-weighted mean token length.

    One explode + groupBy(doc, token) + groupBy(doc): both aggregations are
    map-side combined; nothing is windowed over raw tokens. Ratios are rounded
    to 6dp so the downstream boolean flags are engine-portable."""
    tok = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks"))
    per_tok = (
        tok.filter(F.size("__toks") > 0)
        .select("doc_id", F.explode("__toks").alias("tok"))
        .groupBy("doc_id", F.lower("tok").alias("tok"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_tok.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique_tokens"),
        F.round(F.count(F.lit(1)) / F.sum("cnt"), 6).alias("type_token_ratio"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_token_frac"),
        F.round(
            F.sum(F.length("tok") * F.col("cnt")) / F.sum("cnt"), 6
        ).alias("mean_token_len"),
    )


# Gopher-ish acceptance thresholds (Rae et al. 2021 table A1 spirit, adapted to
# the synthetic corpus's 10-99-token docs so both outcomes occur).
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 100_000
GOPHER_WORDLEN_RANGE = (3.0, 10.0)
GOPHER_MIN_TTR = 0.2
GOPHER_MAX_TOP_TOKEN_FRAC = 0.2


def gopher_flags(profile: DataFrame) -> DataFrame:
    """Boolean rule columns + overall keep decision over `repetition_profile`
    output. Pure column expressions on 6dp-rounded inputs."""
    ok_len = F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
    ok_wordlen = F.col("mean_token_len").between(*GOPHER_WORDLEN_RANGE)
    ok_ttr = F.col("type_token_ratio") >= GOPHER_MIN_TTR
    ok_top = F.col("top_token_frac") <= GOPHER_MAX_TOP_TOKEN_FRAC
    return profile.select(
        "*",
        ok_len.alias("ok_length"),
        ok_wordlen.alias("ok_wordlen"),
        ok_ttr.alias("ok_ttr"),
        ok_top.alias("ok_top_token"),
        (ok_len & ok_wordlen & ok_ttr & ok_top).alias("keep"),
    )


# -- benchmark decontamination -----------------------------------------------------
def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Flag training documents whose k-gram shingles overlap a benchmark/eval
    set (the GPT-3/PaLM-style n-gram decontamination pass).

    Per corpus doc: n_shingles (distinct), n_contaminated (distinct shingles
    that appear anywhere in the benchmark), contamination = n_contaminated /
    n_shingles rounded to 6dp, and contaminated = contamination >= threshold.
    Docs with < k tokens have no shingles and are reported with n_shingles=0,
    contamination=0.0 (nothing to match on).

    Scale: the benchmark's distinct shingle-digest set is tiny next to the
    corpus (eval suites are thousands of docs; corpora are billions), so it is
    explicitly broadcast — the corpus side is one scan + shingle explode +
    broadcast-hash semi-probe + one groupBy(doc). Never an all-pairs join."""
    bench_sh = (
        shingle_rows(benchmark, id_col, text_col, k=k)
        .select(F.md5("s").alias("sh"))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    corpus_sh = shingle_rows(corpus, id_col, text_col, k=k).select(
        "doc", F.md5("s").alias("sh")
    ).distinct()
    overlap = (
        corpus_sh.join(F.broadcast(bench_sh), "sh", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.count(F.col("__hit")).cast("bigint").alias("n_contaminated"),
        )
    )
    ids = corpus.select(F.col(id_col).alias("doc"))
    return (
        ids.join(overlap, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("n_contaminated", F.lit(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.round(
                F.coalesce(
                    F.col("n_contaminated") / F.col("n_shingles"), F.lit(0.0)
                ),
                6,
            ).alias("contamination"),
        )
        .withColumn("contaminated", F.col("contamination") >= F.lit(threshold))
    )
