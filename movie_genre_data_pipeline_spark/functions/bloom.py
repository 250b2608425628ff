"""Distributed Bloom filter as pure DataFrame operations — the 100 TB membership
path for decontamination / blocklist / seen-before checks.

Why this exists: `curation.decontaminate` broadcasts the benchmark's full distinct
shingle-digest set (a string per shingle). That is right when the benchmark is
thousands of docs, but the same probe pattern also covers blocklists of billions
of keys (e.g. "was this URL crawled before", "is this fingerprint in the previous
snapshot"), where shipping the digests themselves is no longer broadcastable. A
Bloom filter compresses ANY number of keys into a fixed m-bit bitmap with a known
false-positive rate, and both the build and the probe stay fully distributed:

- Build: one explode (k positions per key) + one `bit_or` hash aggregation keyed
  by word index. Map-side combine collapses each task's contribution to at most
  m/32 rows before the shuffle, so shuffle volume is O(m), INDEPENDENT of the
  number of keys. The resulting bitmap DataFrame has m/32 rows.
- Probe: k broadcast-hash left joins (the bitmap is tiny by construction) — the
  probed table is scanned ONCE, never shuffled, and the hit test is a bitwise
  AND inside whole-stage codegen. No explode of the corpus, no re-aggregation.
- FP rate: (1 - e^(-k·n/m))^k for n keys. Size m ~ 10·n bits for ~1% at k=3.
  False positives are an explicit part of the contract; callers follow with an
  exact verification join on the (much smaller) flagged subset — the same
  two-phase discipline as LSH-then-verify in `dedup`.

Portability discipline: positions come from the 48-bit prefix of md5(key ":" i)
— deterministic and engine-reproducible, so a SQL oracle can rebuild the IDENTICAL
bitmap and reproduce even the false positives bit-for-bit. Words are 32 bits
stored in BIGINT: masks stay in the positive range on every engine (no sign-bit
edge cases for 1<<63 in engines that error on BIGINT overflow).

Spark-first notes: the bitmap aggregation uses the built-in `bit_or` (JVM-side,
partial-aggregated); there are no UDFs anywhere. Spark's own
`spark.util.sketch.BloomFilter` (DataFrameStatFunctions.buildBloomFilter) is a
driver-materialized JVM object — fine inside one job, but not a DataFrame, not
portable across engines, and not writable/readable as a table. This bitmap IS a
DataFrame: it can be persisted as parquet and re-probed by later runs (the
incremental-dedup ledger pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32  # 32-bit words in BIGINT: masks stay positive on every engine


# PySpark's shiftleft() only takes a literal shift amount, so a variable-bit
# mask is an element_at over the 32 precomputed one-bit words (still a pure
# codegen'd expression, no UDF).
def _mask(bit: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(1 << b).cast("bigint") for b in range(WORD_BITS)]),
        (bit + F.lit(1)).cast("int"),
    )


def _position(key: Column, i: int, m_bits: int) -> Column:
    """i-th hash position in [0, m_bits): 48-bit md5 prefix of key:i, mod m."""
    h48 = F.conv(
        F.substring(F.md5(F.concat_ws(":", key, F.lit(str(i)))), 1, 12), 16, 10
    ).cast("bigint")
    return h48 % F.lit(m_bits)


def build_bloom(
    keys: DataFrame, key_col: str, m_bits: int = 65536, k: int = 3
) -> DataFrame:
    """Aggregate a key column into an m-bit Bloom bitmap: DataFrame of
    (word_idx bigint, word bigint), at most m_bits/32 rows.

    One explode (k rows per key) + one partial-aggregated `bit_or` groupBy —
    shuffle volume is bounded by the bitmap size, not the key count."""
    if m_bits % WORD_BITS != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of {WORD_BITS}")
    if k < 1:
        raise ValueError("k must be >= 1")
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_position(key, i, m_bits) for i in range(k)])
    ).alias("__pos")
    bitmap = (
        keys.select(pos)
        .select(
            F.floor(F.col("__pos") / WORD_BITS).cast("bigint").alias("word_idx"),
            _mask(F.col("__pos") % WORD_BITS).alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("word"))
    )
    # Stamp the build parameters into the schema (zero runtime cost) so a probe
    # with mismatched m_bits/k fails loudly instead of returning plausible
    # nonsense. Metadata survives parquet round-trips via the schema footer.
    return bitmap.withColumn(
        "word", F.col("word").alias("word", metadata={"m_bits": m_bits, "k": k})
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 65536,
    k: int = 3,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Add `out_col` (boolean): true iff all k bits for `key_col` are set in the
    bitmap — i.e. the key is possibly-in-set (false positives at the documented
    rate; false negatives never).

    k broadcast-hash left joins against the tiny bitmap: the probed frame is
    scanned once and never shuffled; each hit test is (word & mask) != 0 inside
    codegen. A missing word row means those 32 bits are all zero -> miss.

    If the bitmap carries build-parameter metadata (build_bloom stamps m_bits/k
    onto the `word` column, preserved through parquet), a probe with different
    parameters raises instead of returning wrong membership bits."""
    if m_bits % WORD_BITS != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of {WORD_BITS}")
    if k < 1:
        raise ValueError("k must be >= 1")
    try:
        meta = bloom.schema["word"].metadata or {}
    except KeyError:
        meta = {}
    built = (meta.get("m_bits"), meta.get("k"))
    if built != (None, None) and built != (m_bits, k):
        raise ValueError(
            f"bloom bitmap was built with m_bits={built[0]}, k={built[1]} but "
            f"probed with m_bits={m_bits}, k={k} — a mismatched probe returns "
            "wrong membership bits"
        )
    key = F.col(key_col)
    out = df
    generated: set[str] = set()
    reserved = {f"__bloom_idx{i}" for i in range(k)} | {
        f"__bloom_word{i}" for i in range(k)
    }
    clash = reserved & set(df.columns)
    if clash:
        # a user column with a reserved internal name would be silently dropped
        # by the post-join cleanup (and make the join ambiguous) — refuse instead
        raise ValueError(f"input columns collide with bloom internals: {sorted(clash)}")
    hits: list[Column] = []
    for i in range(k):
        pos = _position(key, i, m_bits)
        widx, wval = f"__bloom_idx{i}", f"__bloom_word{i}"
        generated.update((widx, wval))
        b = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(widx), F.col("word").alias(wval)
            )
        )
        out = out.join(
            b, F.floor(pos / WORD_BITS).cast("bigint") == F.col(widx), "left"
        )
        mask = _mask(pos % WORD_BITS)
        hits.append(
            F.coalesce(F.col(wval), F.lit(0)).bitwiseAND(mask) != F.lit(0)
        )
    # drop ONLY the exact generated join columns — user columns keep any name
    keep = [c for c in out.columns if c not in generated]
    hit_all = hits[0]
    for h in hits[1:]:
        hit_all = hit_all & h
    return out.select(*keep, hit_all.alias(out_col))
