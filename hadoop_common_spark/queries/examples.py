"""Hadoop example-job parity queries (SURVEY.md §2.11 acceptance set):
WordCount, Grep, word-length statistics — over the `documents` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_common_spark.functions.exact import dsum_sql
from hadoop_common_spark.operators.textstats import grep, word_count, word_length_stats
from hadoop_common_spark.queries import query

_WORDS_SQL = """
    SELECT word FROM (
      SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents
    ) WHERE word != ''
"""


@query(
    "wordcount",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM ({_WORDS_SQL})
    GROUP BY word
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EX/WordCount.java: tokenize → count. Partial aggregation (the
    reference's combiner, WordCount.java:78) is automatic map-side
    HashAggregate."""
    return word_count(spark.table("documents"), "text")


@query(
    "grep_count",
    oracle="""
    SELECT match, COUNT(*) AS cnt
    FROM (
      SELECT unnest(regexp_extract_all(text, 's\\w+')) AS match FROM documents
    )
    GROUP BY match
    """,
)
def grep_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EX/Grep.java: regex extract-all → count → sort desc. The reference
    runs two chained MR jobs with an HDFS round-trip (Grep.java:55-92);
    here it is one lazy plan."""
    return grep(spark.table("documents"), "text", r"s\w+")


@query(
    "word_length_stats",
    oracle=f"""
    SELECT COUNT(len) AS n_words,
           ({dsum_sql('len')} / COUNT(len)) AS mean_len,
           CAST(quantile_cont(len, 0.5) AS DOUBLE) AS median_len,
           SQRT(({dsum_sql('len * len')}
                 - {dsum_sql('len')}
                   * {dsum_sql('len')}
                   / CAST(COUNT(len) AS DOUBLE))
                / CAST(COUNT(len) AS DOUBLE)) AS stddev_len
    FROM (SELECT CAST(length(word) AS DOUBLE) AS len FROM ({_WORDS_SQL}))
    """,
)
def word_length_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EX/WordMean.java:54-91 + WordMedian.java:121 +
    WordStandardDeviation.java:90-129 — one pass instead of three jobs.
    Median is exact percentile (reference scans a length histogram)."""
    return word_length_stats(spark.table("documents"), "text")


@query(
    "multi_source_wordcount",
    oracle=f"""
    SELECT source, word, COUNT(*) AS cnt
    FROM (
      SELECT source, unnest(string_split_regex(text, '\\s+')) AS word FROM documents
    )
    WHERE word != ''
    GROUP BY source, word
    """,
)
def multi_source_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EX/MultiFileWordCount.java / MultipleInputs: per-source wordcount.
    Small-file packing is Spark's file-source bin-packing
    (maxPartitionBytes); per-path mapping becomes a grouping column."""
    from pyspark.sql import functions as F

    df = spark.table("documents")
    words = df.select(
        "source", F.explode(F.split(F.col("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("source", "word").agg(F.count(F.lit(1)).alias("cnt"))
