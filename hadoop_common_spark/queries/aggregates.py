"""Aggregate-framework queries (SURVEY.md §2.5): the descriptor DSL,
UniqValueCount, ValueHistogram — over the `events` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_common_spark.functions.exact import dsum_sql
from hadoop_common_spark.operators.aggregate import aggregate_job, value_histogram
from hadoop_common_spark.queries import query


@query(
    "aggregate_framework",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS record_count,
           {dsum_sql('value')} AS value_sum,
           MAX(user_id) AS max_user,
           MIN(user_id) AS min_user,
           COUNT(DISTINCT user_id) AS uniq_users,
           MAX(props) AS max_props,
           MIN(props) AS min_props
    FROM events
    GROUP BY event_type
    """,
)
def aggregate_framework(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ValueAggregator descriptor DSL (lib/aggregate, dispatch at
    ValueAggregatorBaseDescriptor.java:39-117) as one groupBy().agg():
    every aggregator type exercised in a single job."""
    df = spark.table("events")
    out = aggregate_job(
        df,
        ["event_type"],
        [
            ("value_sum", "DoubleValueSum", "value"),
            ("max_user", "LongValueMax", "user_id"),
            ("min_user", "LongValueMin", "user_id"),
            ("uniq_users", "UniqValueCount", "user_id"),
            ("max_props", "StringValueMax", "props"),
            ("min_props", "StringValueMin", "props"),
        ],
    )
    counts = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("record_count"))
    return counts.join(out, "event_type").select(
        "event_type", "record_count", "value_sum", "max_user", "min_user",
        "uniq_users", "max_props", "min_props",
    )


@query(
    "uniq_value_count",
    oracle="""
    SELECT user_id, COUNT(DISTINCT event_type) AS uniq_event_types,
           LEAST(COUNT(DISTINCT event_type), 3) AS capped_uniq
    FROM events
    GROUP BY user_id
    """,
)
def uniq_value_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniqValueCount (UniqValueCount.java:36-63) with and without the
    item cap (exact-count semantics; deviation documented in
    operators/aggregate.py)."""
    df = spark.table("events")
    return aggregate_job(
        df,
        ["user_id"],
        [
            ("uniq_event_types", "UniqValueCount", "event_type"),
            ("capped_uniq", "UniqValueCount", "event_type", 3),
        ],
    )


@query(
    "value_histogram",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_distinct_values,
           MIN(_cnt) AS min_count,
           list_sort(list(_cnt))[COUNT(*) // 2 + 1] AS median_count,
           MAX(_cnt) AS max_count,
           (CAST(SUM(_cnt) AS DOUBLE) / CAST(COUNT(_cnt) AS DOUBLE)) AS mean_count,
           SQRT((CAST(SUM(_cnt * _cnt) AS DOUBLE)
                 - CAST(SUM(_cnt) AS DOUBLE) * CAST(SUM(_cnt) AS DOUBLE)
                   / CAST(COUNT(_cnt) AS DOUBLE))
                / CAST(COUNT(_cnt) AS DOUBLE)) AS stddev_count
    FROM (
      SELECT user_id, event_type, COUNT(*) AS _cnt
      FROM events GROUP BY user_id, event_type
    )
    GROUP BY user_id
    """,
)
def value_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ValueHistogram report (ValueHistogram.java:83-120): per user, the
    distribution of event_type frequencies — #distinct,
    min/median/max/mean/stddev of the counts. Median is the reference's
    sorted-counts[length/2] element (no interpolation)."""
    return value_histogram(spark.table("events"), ["user_id"], "event_type")


@query(
    "events_basic_stats",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           ({dsum_sql('value')} / COUNT(value)) AS avg_value
    FROM events
    GROUP BY user_id
    """,
)
def events_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IntSumReducer/LongSumReducer shape (lib/reduce/IntSumReducer.java:34)
    over the K/V-style events table: per-key sum/min/max/avg/count."""
    from hadoop_common_spark.functions.exact import dsum

    df = spark.table("events")
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (dsum("value") / F.count("value")).alias("avg_value"),
    )
