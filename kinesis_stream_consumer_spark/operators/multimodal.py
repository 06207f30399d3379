"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata.

The container has no image/audio codecs, so the decode/feature steps are
STUBS behind clearly-marked seams (deterministic fakes or
NotImplementedError). The Spark-side plumbing — binary columns, metadata
structs, Arrow-batched mapInPandas signatures, partition sizing — is real
and tested: swapping a real decoder in changes only the inner function.

Scale design: binary payloads ride in their own column so Parquet stores
them as byte arrays with metadata columns still prunable; feature extraction
runs via mapInPandas (Arrow batches) so one Python worker processes
thousands of payloads per batch, and `spark.sql.files.maxPartitionBytes`
bounds per-task memory for large blobs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature_dim", LongType()),
        StructField("feature_sig", StringType()),
    ]
)


def as_media(df: DataFrame, id_col: str, payload_col: Column, mime: str) -> DataFrame:
    """Wrap an arbitrary payload column as the engine's canonical media row:
    (media_id, mime, payload binary, n_bytes, sha256)."""
    payload = payload_col.cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(mime).alias("mime"),
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB: real implementation would be PIL/libvips decode. The container
    ships no codecs; callers in tests use extract_features' deterministic
    fake instead."""
    raise NotImplementedError(
        "image decode requires an image codec not present in this environment"
    )


def _fake_feature_signature(payload: bytes, dim: int) -> str:
    """Deterministic stand-in for a decoded-media feature vector: a stable
    digest of (payload, dim). Replace with a real decode+embed to productionize."""
    import hashlib

    return hashlib.sha256(payload + f"|dim={dim}".encode()).hexdigest()[:16]


def extract_features(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    The batch shape is the real contract: each pandas DataFrame chunk holds
    payload bytes + metadata; the inner loop is where a real decoder slots
    in. Output schema is fixed (FEATURE_SCHEMA) so downstream plans are
    stable regardless of the decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "feature_dim": feature_dim,
                    "feature_sig": [
                        _fake_feature_signature(bytes(p), feature_dim)
                        for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sig", LongType()),
    ]
)


def perceptual_signature(media: DataFrame, segments: int = 32) -> DataFrame:
    """(media_id, sig) — a pHash-SHAPED perceptual signature over the raw
    payload bytes: the stream splits into ``segments`` equal spans, bit b
    is 1 iff span b's byte-value sum exceeds the payload's mean span sum
    (a real pHash applies the same above-median rule to DCT coefficients
    of the DECODED image; byte-span sums are the codec-free deterministic
    stand-in — same signature algebra, same downstream banding). Small
    local edits perturb a few spans, so true near-dups land within a few
    bits of each other — unlike the avalanche sha256 feature digest,
    this is locality-sensitive by construction. Arrow-batched
    mapInPandas; exact integer arithmetic (numpy int64), so the SQL
    oracle reproduces bits exactly."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for p in pdf["payload"]:
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                n = buf.shape[0]
                if n == 0:
                    sigs.append(0)
                    continue
                seg = (np.arange(n, dtype=np.int64) * segments) // n
                sums = np.bincount(
                    seg, weights=buf, minlength=segments
                ).astype(np.int64)
                total = int(sums.sum())
                bits = ((sums * segments) > total).astype(np.int64)
                shifted = bits << np.arange(segments, dtype=np.int64)
                sigs.append(int(shifted.sum()))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "sig": sigs}
            )

    return media.mapInPandas(run, PHASH_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched image resize via mapInPandas — decode/resize/encode is
    a STUB (deterministic fake: digest-derived bytes tagged with the target
    dims; a real PIL/libvips body slots into `fake_resize` unchanged in
    shape). Payload-in/payload-out through Arrow is the real, tested
    contract: binary columns survive the round trip and the output schema
    carries the new dimensions as prunable metadata."""

    def fake_resize(payload: bytes) -> bytes:
        import hashlib

        digest = hashlib.sha256(
            payload + f"|{width}x{height}".encode()
        ).digest()
        return digest  # stand-in for re-encoded image bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [fake_resize(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "payload": resized,
                    "n_bytes": [len(p) for p in resized],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB plumbing for video frame sampling: emits one row per sampled
    frame index based on metadata only (duration unknown without a decoder,
    so n_frames is faked as n_bytes // 1024). The explode/partition shape is
    what matters at scale — one media row fans out to its frames without
    collecting to the driver."""
    n_frames = (F.col("n_bytes") / 1024).cast("long")
    frames = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return media.select(
        "media_id", "mime", F.explode(frames).alias("frame_index")
    )


def chunk_hash_rows(media: DataFrame, chunk_bytes: int = 64) -> DataFrame:
    """(media_id, chunk_index, chunk_hash) — piecewise signature of a binary
    payload: md5 of each aligned full ``chunk_bytes`` slice (the ragged tail
    is dropped so every hashed chunk has identical width). One substring +
    md5 per chunk, all JVM-side; one media row fans out to its chunks via
    sequence+explode, nothing collects to the driver."""
    n_chunks = (F.col("n_bytes") / chunk_bytes).cast("long")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    rows = media.where(F.col("n_bytes") >= chunk_bytes).select(
        "media_id", "payload", F.explode(idx).alias("chunk_index")
    )
    return rows.select(
        "media_id",
        "chunk_index",
        F.md5(
            F.expr(f"substring(payload, chunk_index * {chunk_bytes} + 1, {chunk_bytes})")
        ).alias("chunk_hash"),
    )


def chunk_signature_pairs(
    media: DataFrame, chunk_bytes: int = 64, min_shared: int = 2
) -> DataFrame:
    """Near-duplicate media pairs by piecewise chunk-hash matching — the
    binary-payload analogue of MinHash-LSH for opaque media columns
    (images/audio shipped as bytes): two payloads sharing at least
    ``min_shared`` aligned chunks (same index AND same md5) are flagged,
    robust to localized corruption/replacement while needing no codec.
    Production variant: content-defined chunking (rolling-hash cut points,
    ssdeep/FastCDC-style) makes the signature insertion-robust; the
    alignment, join and verify shape here is identical.

    Scale shape: payloads reduce map-side to slim (idx, hash) rows; the
    self-equi-join keys on (chunk_index, chunk_hash) — md5-uniform, so no
    skew — and only identical-chunk buckets ever pair up. No O(n²) stage;
    per-bucket fan-out is bounded by how many true copies of a chunk exist.

    Returns (media_a, media_b, n_shared, n_chunks_a, n_chunks_b,
    shared_bp) where shared_bp = n_shared / min(n_chunks) in integer basis
    points.
    """
    chunks = chunk_hash_rows(media, chunk_bytes).localCheckpoint(eager=True)
    counts = chunks.groupBy(F.col("media_id")).agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    pairs = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.chunk_index") == F.col("b.chunk_index"))
            & (F.col("a.chunk_hash") == F.col("b.chunk_hash"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(counts.withColumnRenamed("media_id", "media_a"), "media_a")
        .withColumnRenamed("n_chunks", "n_chunks_a")
        .join(counts.withColumnRenamed("media_id", "media_b"), "media_b")
        .withColumnRenamed("n_chunks", "n_chunks_b")
        .select(
            "media_a",
            "media_b",
            "n_shared",
            "n_chunks_a",
            "n_chunks_b",
            F.floor(
                10000.0
                * F.col("n_shared")
                / F.least("n_chunks_a", "n_chunks_b")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("shared_bp"),
        )
    )


def audio_chunk_plan(
    media: DataFrame, chunk_bytes: int, hop_bytes: int
) -> DataFrame:
    """Fixed-window audio chunking with overlap — REAL byte slicing, no
    codec needed: for PCM-style payloads a chunk is a byte range
    (chunk_bytes ≈ window_seconds × sample_rate × sample_width), so
    windowing is `substring` on the binary column. One media row fans out
    to its chunks via sequence+explode — all JVM-side, nothing collects to
    the driver, and the chunk payload rides as a real binary column ready
    for a downstream feature extractor.

    Chunks start every ``hop_bytes`` (hop < chunk ⇒ overlap, the standard
    ASR windowing); a final short tail chunk is emitted so no audio is
    dropped."""
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.col("n_bytes") - F.lit(hop_bytes) + 1, F.lit(1)),
        F.lit(hop_bytes),
    )
    chunked = media.select(
        "media_id",
        "mime",
        "payload",
        F.posexplode(starts).alias("chunk_index", "byte_start"),
    )
    chunk = F.expr(f"substring(payload, byte_start, {chunk_bytes})")
    return chunked.select(
        "media_id",
        "mime",
        "chunk_index",
        "byte_start",
        chunk.alias("chunk"),
        F.octet_length(chunk).alias("chunk_bytes"),
    )
