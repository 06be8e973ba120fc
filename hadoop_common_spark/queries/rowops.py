"""Per-record transform queries (SURVEY.md §2.3): field-selection DSL,
inverse map, JSON field extraction, sampled scans (§2.1 filters)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_common_spark.operators.fieldsel import field_select
from hadoop_common_spark.queries import query

# A delimited "line" built from non-float columns (int→string rendering is
# identical across engines; float rendering is not, so keep floats out of
# string round-trips).
_LINE_SPARK = ("user_id", "event_type", "props", "event_id")
_LINE_SQL = "(user_id || chr(9) || event_type || chr(9) || props || chr(9) || event_id)"


@query(
    "field_selection",
    oracle=f"""
    SELECT (event_type || chr(9) || user_id) AS key,
           (props || chr(9) || event_id) AS value
    FROM events
    """,
)
def field_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FieldSelectionMapper spec '1,0:2-' over tab-joined records
    (FieldSelectionHelper.java:30-69): key = fields 1,0; value = fields
    2..end. Compiled to split/slice/concat_ws — no UDF."""
    df = spark.table("events").withColumn(
        "line", F.concat_ws("\t", *[F.col(c) for c in _LINE_SPARK])
    )
    return field_select(df, "line", "1,0:2-").select("key", "value")


@query(
    "inverse_map",
    oracle="""
    SELECT event_type AS key, user_id AS value FROM events
    """,
)
def inverse_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InverseMapper (lib/map/InverseMapper.java:30): (k,v) → (v,k) is a
    projection."""
    return spark.table("events").select(
        F.col("event_type").alias("key"), F.col("user_id").alias("value")
    )


@query(
    "json_field_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS cnt
    FROM events
    GROUP BY k
    """,
)
def json_field_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed field extraction from a JSON payload column — the modern form
    of the field-selection DSL (reference records were delimited text;
    ours carry JSON props)."""
    return (
        spark.table("events")
        .select(F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "percent_sampled_scan",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
    """,
)
def percent_sampled_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SequenceFileInputFilter.PercentFilter/MD5Filter (:153,:202): keep
    records whose key-hash ≡ 0 (mod f). md5-based so the sample is
    deterministic and engine-independent; the predicate sits directly on
    the scan so Catalyst prunes early."""
    df = spark.table("events")
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10).cast("bigint")
    return df.filter(h % 10 == 0).select("event_id", "user_id", "event_type")


@query(
    "regex_filtered_scan",
    oracle="""
    SELECT lang, COUNT(*) AS cnt
    FROM documents
    WHERE regexp_matches(text, 'stream\\w*')
    GROUP BY lang
    """,
)
def regex_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SequenceFileInputFilter.RegexFilter (:110): scan keeping only
    records matching a pattern; rlike pushes to the scan filter."""
    return (
        spark.table("documents")
        .filter(F.col("text").rlike(r"stream\w*"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
