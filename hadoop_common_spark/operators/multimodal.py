"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Engine extension (north star): image/audio/video content is carried as
``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` — the sanctioned Python slow path (PipeMapRed's
stdin/stdout pipe, ST/PipeMapRed.java:46, reborn as Arrow batches).

Two kernel modes behind one plumbing (schema, batch iteration,
partitioning are identical — that is the design claim, and the tests
pin it): ``fake=True`` derives deterministic pseudo-metadata from the
content's md5 (reproducible cross-engine, so oracle-checkable against
the synthetic testdata, whose binary columns are UTF-8 text, not real
media); ``fake=False`` REALLY decodes — image dimensions from
PNG/GIF/BMP/JPEG headers and WAV audio via the stdlib ``wave`` module
(no external deps), with PIL/soundfile widening format coverage when
importable.
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


def _real_dims(b: bytes) -> tuple[int, int]:
    """REAL (width, height) decode from the image container header —
    PNG/GIF/BMP/JPEG need only stdlib byte parsing; anything else falls
    through to PIL when importable. Raises ValueError on undecodable
    content (the caller surfaces it per-batch)."""
    import struct

    if b[:8] == b"\x89PNG\r\n\x1a\n":  # IHDR is always the first chunk
        w, h = struct.unpack(">II", b[16:24])
        return w, h
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return w, h
    if b[:2] == b"BM":
        # DIB header size at offset 14 distinguishes the families: 12 =
        # OS/2 BITMAPCOREHEADER (16-bit fields), 40+ = BITMAPINFOHEADER
        # and its V4/V5 extensions (32-bit fields). Anything else is not
        # a layout we can parse — raise like other undecodable inputs
        # rather than reading garbage (ADVICE r4).
        dib = struct.unpack("<I", b[14:18])[0]
        if dib == 12:
            w, h = struct.unpack("<HH", b[18:22])
            return w, h
        if dib in (40, 52, 56, 64, 108, 124):
            w, h = struct.unpack("<ii", b[18:26])
            return w, abs(h)
        raise ValueError(f"unsupported BMP DIB header size {dib}")
    if b[:2] == b"\xff\xd8":  # JPEG: walk markers to a SOF segment
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return w, h
            i += 2 + seglen
        raise ValueError("no SOF marker in JPEG stream")
    try:
        import io as _io

        from PIL import Image  # optional: broadens format coverage

        with Image.open(_io.BytesIO(b)) as im:
            return im.size
    except ImportError:
        raise ValueError(
            f"unrecognized image container (magic {b[:4]!r}); PNG/GIF/BMP/"
            f"JPEG decode natively, others need PIL installed"
        )


def decode_image(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode binary image content to (width, height) metadata.

    ``fake=True``: deterministic md5-derived pseudo-dimensions — the
    oracle-checkable mode for synthetic test payloads (the testdata's
    binary columns are UTF-8 text, not images).
    ``fake=False``: REAL header decode — PNG/GIF/BMP/JPEG via stdlib
    byte parsing, other formats via PIL when importable (see
    :func:`_real_dims`). Same mapInPandas loop, same schema, same
    batching — only the per-batch kernel differs, which is the whole
    design claim of the multimodal tier.
    """
    dims_of = _fake_dims if fake else None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if dims_of is not None:
                digests = pdf["content"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
                dims = digests.map(dims_of)
            else:
                dims = pdf["content"].map(lambda b: _real_dims(bytes(b)))
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


def _real_audio_features(b: bytes) -> tuple[int, int, float]:
    """REAL (sample_rate, duration_ms, rms) from a WAV container via the
    stdlib ``wave`` module + numpy (16-bit PCM); other containers via
    soundfile when importable. rms is normalized to [0, 1] against
    int16 full scale."""
    import io as _io

    import numpy as np

    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        import wave

        with wave.open(_io.BytesIO(b)) as w:
            rate = w.getframerate()
            nframes = w.getnframes()
            width = w.getsampwidth()
            raw = w.readframes(nframes)
        if width != 2:
            raise ValueError(f"only 16-bit PCM WAV supported natively, got {8*width}-bit")
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
        return rate, nframes * 1000 // rate, rms
    try:
        import soundfile  # optional: flac/ogg/etc.

        data, rate = soundfile.read(_io.BytesIO(b), dtype="float64")
        rms = float(np.sqrt(np.mean(data**2))) if len(data) else 0.0
        return rate, len(data) * 1000 // rate, rms
    except ImportError:
        raise ValueError(
            f"unrecognized audio container (magic {b[:4]!r}); WAV decodes "
            f"natively, others need soundfile installed"
        )


def audio_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature-extract binary audio content → (sample_rate, duration_ms,
    rms). ``fake=True``: md5-derived pseudo-features (sample rate from a
    fixed set, duration from byte length at 16-bit mono, rms in [0,1)) —
    the oracle-checkable mode for the synthetic testdata. ``fake=False``:
    REAL decode — WAV via the stdlib ``wave`` module + numpy rms, other
    containers via soundfile when importable. Identical Arrow-batched
    mapInPandas loop and schema in both modes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
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
            else:
                feats = pdf["content"].map(lambda b: _real_audio_features(bytes(b)))
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "sample_rate": feats.map(lambda f: f[0]).astype("int64"),
                        "duration_ms": feats.map(lambda f: f[1]).astype("int64"),
                        "rms": feats.map(lambda f: f[2]).astype("float64"),
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
