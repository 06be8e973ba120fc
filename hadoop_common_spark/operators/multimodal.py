"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Engine extension (north star): image/audio/video content is carried as
``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` — the sanctioned Python slow path (PipeMapRed's
stdin/stdout pipe, ST/PipeMapRed.java:46, reborn as Arrow batches).

This container has no image/audio libraries, so the actual codecs are
STUBS (clearly marked): ``decode_image`` with ``fake=True`` derives
deterministic pseudo-metadata from the content's md5 — the Spark-side
plumbing (schema, batch iteration, partitioning) is real and tested, and
the fake is reproducible cross-engine so it can be oracle-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
    ]
)


def as_media_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap a text column as an opaque binary payload + metadata — the
    schema shape a real ingest (binaryFile reader + sidecar metadata)
    produces."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        content.alias("content"),
        F.length(content).cast("bigint").alias("byte_len"),
        F.md5(content).alias("content_md5"),
    )


def _fake_dims(digest_hex: str) -> tuple[int, int]:
    """Deterministic pseudo width/height from an md5 hex digest.

    width  = 1 + (int(hex[:15], 16) % 1920)
    height = 1 + (int(hex[15:30], 16) % 1080)
    """
    return (
        1 + int(digest_hex[:15], 16) % 1920,
        1 + int(digest_hex[15:30], 16) % 1080,
    )


def decode_image(df: DataFrame, fake: bool = True) -> DataFrame:
    """'Decode' binary image content to (width, height) metadata.

    STUB: with ``fake=True`` (the only mode available in this container)
    dimensions are md5-derived pseudo-values; with ``fake=False`` a real
    build would call PIL/libvips inside the same mapInPandas loop.

    The mapInPandas structure is the real thing: Arrow-batched iteration,
    no per-row Python overhead, output schema declared up front — swap
    ``_fake_dims`` for an actual decoder and nothing else changes.
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding needs PIL/libvips — not available in this "
            "container; use fake=True (deterministic md5-derived metadata)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests = pdf["content"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            dims = digests.map(_fake_dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["content"].map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                }
            )

    return df.select("doc_id", "content").mapInPandas(batches, DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """'Frame-sample' a binary payload: emit one row per sampled offset
    (video keyframe extraction shape). STUB sampling = fixed byte stride;
    a real build reads container timestamps. Pure built-ins — the
    explode keeps it JVM-side."""
    n_frames = F.least(
        F.lit(max_frames),
        F.greatest(F.lit(1), (F.col("byte_len") / every_n_bytes).cast("long")),
    )
    return df.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "_i"),
    ).select(
        "doc_id",
        "frame_no",
        (F.col("frame_no") * every_n_bytes).cast("bigint").alias("byte_offset"),
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)

_SAMPLE_RATES = (8000, 16000, 44100)


def audio_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """'Feature-extract' binary audio content → (sample_rate, duration_ms,
    rms). STUB: with ``fake=True`` features are md5-derived pseudo-values
    (sample rate picked from a fixed set, duration from byte length at
    16-bit mono, rms in [0,1)); a real build would call librosa/soundfile
    inside the same Arrow-batched mapInPandas loop — schema, batching, and
    partitioning are the real thing."""
    if not fake:
        raise NotImplementedError(
            "real audio decoding needs librosa/soundfile — not available in "
            "this container; use fake=True (deterministic md5-derived features)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests = pdf["content"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            byte_len = pdf["content"].map(len).astype("int64")
            rate = digests.map(lambda h: _SAMPLE_RATES[int(h[:15], 16) % 3]).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": rate,
                    # 16-bit mono PCM: bytes/2 samples → ms = samples*1000/rate
                    "duration_ms": (byte_len * 500) // rate,
                    "rms": digests.map(lambda h: (int(h[15:30], 16) % 10000) / 10000.0),
                }
            )

    return df.select("doc_id", "content").mapInPandas(batches, AUDIO_SCHEMA)


def resize_dims(
    decoded: DataFrame, target_w: int = 256, target_h: int = 256
) -> DataFrame:
    """Aspect-preserving fit of decoded (width, height) into a target box:
    the planning half of an image resize (the pixel transform itself would
    run where decode runs). Pure built-in arithmetic — stays JVM-side; uses
    floor (not round) so the result is tie-free and engine-independent."""
    scale = F.least(
        F.lit(float(target_w)) / F.col("width"), F.lit(float(target_h)) / F.col("height")
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.greatest(F.lit(1).cast("bigint"), F.floor(F.col("width") * scale)).alias("out_w"),
        F.greatest(F.lit(1).cast("bigint"), F.floor(F.col("height") * scale)).alias("out_h"),
    )
