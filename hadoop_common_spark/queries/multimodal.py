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
