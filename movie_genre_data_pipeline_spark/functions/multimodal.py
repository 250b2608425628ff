"""Multimodal (image/audio/video) column plumbing for a training-data pipeline.

Design: media payloads are opaque `binary` columns travelling next to typed
metadata (a struct with modality/mime/width/…), exactly how large-scale training
pipelines ship media through Parquet. All Spark-side machinery here — schemas,
partition-friendly layout, Arrow-batched `mapInPandas` operators with bounded batch
sizes — is real and tested; ONLY the codec inner loop is stubbed because this
container has no image/audio libraries (see `decode_image_stub`): it raises
NotImplementedError unless `fake=True`, in which case it produces a deterministic
fake decode so the plumbing can be exercised end-to-end.

Scale notes:
- Binary columns make rows wide: `spark.sql.files.maxPartitionBytes` governs scan
  partition sizing, and mapInPandas streams Arrow batches so executor memory is
  bounded by batch size, not partition size.
- Feature extraction is embarrassingly parallel; the expensive part is shuffle of
  raw bytes — so extract features FIRST, drop the payload, THEN join/aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType(), False),
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, payload_md5 string, mean_byte double, "
    "width int, height int"
)


def attach_media_meta(
    df: DataFrame, payload_col: str, modality: str, mime: str | None = None
) -> DataFrame:
    """Wrap a raw binary column into the (payload, meta) convention."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    ).withColumnRenamed(payload_col, "payload")


def decode_image_stub(payload: bytes, fake: bool) -> tuple[int, int]:
    """The codec boundary. Real deployments: PIL/opencv/ffmpeg here.
    This container has none of them, so the real path raises (clearly marked);
    fake=True derives deterministic dimensions from the payload hash."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library (PIL/opencv) not present "
            "in this environment; pass fake=True for the deterministic stand-in"
        )
    h = int.from_bytes(payload[:4].ljust(4, b"\0"), "big") if payload else 0
    return (64 + h % 192, 64 + (h >> 8) % 192)


def image_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extractor over (media_id, payload): byte stats + md5 +
    stubbed decode dims. Arrow-batched; payload dropped from the output so
    downstream stages never shuffle raw bytes."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            dims = [
                decode_image_stub(p if p is not None else b"", fake_decode)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "payload_md5": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "mean_byte": [
                        (sum(p) / len(p)) if p else 0.0 for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        extract, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_ts_ms) rows from the
    metadata duration — the downstream decode would read only those offsets.
    Pure column math (sequence+explode), no payload touched."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def resize_images(
    df: DataFrame, target_w: int, target_h: int, fake_decode: bool = True
) -> DataFrame:
    """mapInPandas resize: (media_id, payload) → resized payload + final dims.
    The codec inner loop is the documented stub (no image libs in this
    container): the fake path re-emits a deterministic payload scaled to the
    target pixel count (md5-keyed bytes, length ∝ target_w·target_h/64) so batch
    shapes, memory behavior, and downstream schemas are exercised for real.
    Binary in AND out — this is the one operator class where payload must ride
    the Arrow batches both ways; bound executor memory via
    spark.sql.execution.arrow.maxRecordsPerBatch, not partition size."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out_payloads = []
            for p in pdf["payload"]:
                p = p if p is not None else b""
                decode_image_stub(p, fake_decode)  # the decode boundary
                seed = hashlib.md5(p).digest()
                n = max(1, target_w * target_h // 64)
                out_payloads.append((seed * (n // 16 + 1))[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payloads,
                    "width": target_w,
                    "height": target_h,
                    "n_bytes": [len(p) for p in out_payloads],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        resize, schema=RESIZED_SCHEMA
    )


def block_chunks(df: DataFrame, block_bytes: int = 64) -> DataFrame:
    """Split binary payloads into fixed-size blocks with per-block digests — the
    blob-sharding op for moving/storing large media through block-oriented
    systems (content-addressed caches, chunked uploads, dedup-friendly storage).

    Pure column expressions over the BINARY type (sequence + explode + substring
    + md5): zero Python, zero shuffle, linear in payload bytes. Same
    position-explode shape as text chunking — the generator is a cheap integer
    sequence, the byte slice happens after the explode. Empty payloads emit no
    blocks."""
    if block_bytes <= 0:
        raise ValueError(f"block_bytes must be positive, got {block_bytes}")
    n = F.length("payload")  # octet length for binary
    return (
        df.select("media_id", "payload")
        .filter(F.length("payload") > 0)
        .select(
            "media_id",
            "payload",
            n.alias("__n"),
            F.explode(F.sequence(F.lit(1), n, F.lit(block_bytes))).alias("__s"),
        )
        .select(
            "media_id",
            ((F.col("__s") - 1) / F.lit(block_bytes)).cast("bigint").alias("block_id"),
            F.least(F.lit(block_bytes), F.col("__n") - F.col("__s") + 1)
            .cast("bigint")
            .alias("block_bytes"),
            F.md5(F.col("payload").substr(F.col("__s"), F.lit(block_bytes))).alias(
                "block_digest"
            ),
        )
    )


PHASH_TILES = 64
PHASH_SCHEMA = "media_id long, phash long"


def phash_fingerprints(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Perceptual difference-hash (dHash) fingerprints: (media_id, phash).

    The real-deployment shape: decode → downsample to a tiny grid → hash the
    GRADIENT (each bit = does tile i+1 outweigh tile i), which survives
    re-encoding/rescaling that breaks byte digests. Codec stubbed as everywhere
    in this module (decode_image_stub contract): the "grid" is PHASH_TILES
    equal byte-range tiles of the payload, each reduced to its byte sum —
    deterministic integer math a SQL engine replays exactly.

    mapInPandas (Arrow-batched) like every payload-touching operator here; the
    63-bit fingerprint rides downstream joins, the payload never does.
    """

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                p = p if p is not None else b""
                decode_image_stub(p, fake_decode)  # the codec boundary
                n = len(p)
                tiles = []
                for j in range(PHASH_TILES):
                    lo = j * n // PHASH_TILES
                    hi = (j + 1) * n // PHASH_TILES
                    tiles.append(sum(p[lo:hi]))
                h = 0
                for i in range(PHASH_TILES - 1):
                    if tiles[i + 1] > tiles[i]:
                        h |= 1 << i
                out.append(h)
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": out})

    return df.select("media_id", "payload").mapInPandas(fp, schema=PHASH_SCHEMA)


def phash_near_dup_pairs(
    fps: DataFrame, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """(id_a, id_b, hamming): fingerprint pairs within `max_hamming` bits.

    Multi-index hamming search (the HmSearch / multi-index hashing plan): the
    63-bit hash splits into `bands` disjoint 16-bit substrings; by pigeonhole,
    any pair within max_hamming < bands bits agrees EXACTLY on ≥1 band — so
    candidates come from `bands` equi-joins on (band_idx, band_value), never an
    all-pairs hamming scan, and the true bit_count(xor) filter runs on
    candidates only. Exact (no recall loss) for max_hamming < bands.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole exactness needs max_hamming < bands, got "
            f"{max_hamming} >= {bands}"
        )
    width = 64 // bands
    # The bands must TILE every used fingerprint bit (the hash occupies the
    # low 63 bits): bands * (64 // bands) can fall short for bands that don't
    # divide 64 (e.g. 5 covers only 60 bits), silently missing pairs that
    # differ only in the uncovered high bits — which breaks the pigeonhole
    # exactness claim. Power-of-two band counts always tile.
    if bands * width < PHASH_TILES - 1:
        raise ValueError(
            f"bands={bands} covers only {bands * width} of the "
            f"{PHASH_TILES - 1} fingerprint bits; use a bands value with "
            f"bands * (64 // bands) >= {PHASH_TILES - 1} (e.g. 1, 2, 4, 8, 16)"
        )
    keyed = fps.select(
        F.col("media_id"),
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_idx"),
                        F.shiftrightunsigned(F.col("phash"), k * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("band_val"),
                    )
                    for k in range(bands)
                ]
            )
        ).alias("__b"),
    ).select("media_id", "phash", "__b.band_idx", "__b.band_val")
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.media_id") < F.col("b.media_id"),
            ],
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


BYTE_HISTOGRAM_SCHEMA = "byte_value long, n_occurrences long"


def byte_histogram(df: DataFrame) -> DataFrame:
    """Corpus byte-value histogram over (media_id, payload) — the
    corrupt-encoding / format-drift detector a blob-ingest pipeline runs
    before any decode (a spike at 0x00 or in the non-ASCII range on a
    "text" corpus is an upstream bug, not data). mapInPandas Arrow kernel:
    each batch collapses to AT MOST 256 partial rows via one vectorized
    numpy bincount over the concatenated payload bytes (no per-row Python
    loop over bytes), then a 256-key hash aggregate folds the partials —
    the additive-cell shape, so the streaming twin appends the same
    partials. Only byte values actually present are emitted."""
    import numpy as np

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [p for p in pdf["payload"] if p is not None and len(p) > 0]
            if not bufs:
                continue
            counts = np.bincount(
                np.frombuffer(b"".join(bufs), dtype=np.uint8), minlength=256
            )
            present = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {
                    "byte_value": present.astype("int64"),
                    "n_occurrences": counts[present].astype("int64"),
                }
            )

    partials = df.select("payload").mapInPandas(
        hist, schema=BYTE_HISTOGRAM_SCHEMA
    )
    return partials.groupBy("byte_value").agg(
        F.sum("n_occurrences").cast("bigint").alias("n_occurrences")
    )
