"""Multimodal-column queries (LLM-pipeline extension): binary payload
metadata + stubbed decode via mapInPandas (see operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_common_spark.operators.multimodal import (
    as_media_table,
    decode_image,
    frame_sample,
)
from hadoop_common_spark.queries import query


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata extraction (byte length + content digest):
    the ingest-side half of the multimodal pipeline, all JVM-side."""
    media = as_media_table(spark.table("documents"), "doc_id", "text")
    return media.select("doc_id", "byte_len", "content_md5")


@query(
    "multimodal_fake_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           (1 + ('0x' || substr(md5(text), 1, 15))::BIGINT % 1920) AS width,
           (1 + ('0x' || substr(md5(text), 16, 15))::BIGINT % 1080) AS height
    FROM documents
    """,
)
def multimodal_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed image decode through the REAL mapInPandas plumbing
    (Arrow batches, declared schema); dimensions are md5-derived so the
    oracle can replay them. Swap the stub for PIL and the plan shape is
    unchanged."""
    media = as_media_table(spark.table("documents"), "doc_id", "text")
    return decode_image(media, fake=True)


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, frame_no, frame_no * 64 AS byte_offset
    FROM documents,
         unnest(generate_series(0, CAST(greatest(1, least(8, octet_length(encode(text)) // 64)) AS BIGINT) - 1)) t(frame_no)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling shape (video keyframes): one row per sampled offset,
    bounded fan-out via explode — stays JVM-side."""
    media = as_media_table(spark.table("documents"), "doc_id", "text")
    return frame_sample(media, every_n_bytes=64, max_frames=8)


@query(
    "multimodal_audio_features",
    oracle="""
    SELECT doc_id,
           ([8000, 16000, 44100])[1 + ('0x' || substr(md5(text), 1, 15))::BIGINT % 3] AS sample_rate,
           (CAST(octet_length(encode(text)) AS BIGINT) * 500)
             // ([8000, 16000, 44100])[1 + ('0x' || substr(md5(text), 1, 15))::BIGINT % 3] AS duration_ms,
           (('0x' || substr(md5(text), 16, 15))::BIGINT % 10000) / 10000.0 AS rms
    FROM documents
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed audio feature extraction (sample rate / duration / RMS)
    through the real Arrow-batched mapInPandas plumbing — swap the stub
    for librosa and the plan shape is unchanged."""
    from hadoop_common_spark.operators.multimodal import audio_features

    media = as_media_table(spark.table("documents"), "doc_id", "text")
    return audio_features(media, fake=True)


@query(
    "multimodal_resize_plan",
    oracle="""
    WITH decoded AS (
      SELECT doc_id,
             (1 + ('0x' || substr(md5(text), 1, 15))::BIGINT % 1920) AS width,
             (1 + ('0x' || substr(md5(text), 16, 15))::BIGINT % 1080) AS height
      FROM documents
    )
    SELECT doc_id, width, height,
           greatest(1, CAST(floor(width  * least(256.0 / width, 256.0 / height)) AS BIGINT)) AS out_w,
           greatest(1, CAST(floor(height * least(256.0 / width, 256.0 / height)) AS BIGINT)) AS out_h
    FROM decoded
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning into a 256×256 box over decoded
    dimensions — built-in arithmetic only (the pixel transform would ride
    the same mapInPandas as decode in a real build)."""
    from hadoop_common_spark.operators.multimodal import resize_dims

    media = as_media_table(spark.table("documents"), "doc_id", "text")
    return resize_dims(decode_image(media, fake=True), 256, 256)
