"""Set-operation queries (SURVEY.md §2.7): union, distinct, intersect,
except. The reference only has union (multi-path input) and
distinct-by-reduce; intersect/except are its join idioms, built-in here."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_common_spark.queries import query


@query(
    "union_distinct_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of two sources + distinct (multi-path FileInputFormat input
    + identity-reduce dedup)."""
    c = spark.table("customer").select(F.col("c_nationkey").alias("nationkey"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersect (reference idiom: inner join on key + dedup)."""
    c = spark.table("customer").select(F.col("c_nationkey").alias("nationkey"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "except_nations",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Except (reference idiom: DataJoin with absent tag → anti join)."""
    n = spark.table("nation").select(F.col("n_nationkey").alias("nationkey"))
    s = (
        spark.table("supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return n.exceptAll(s.distinct())


@query(
    "distinct_user_event_pairs",
    oracle="""
    SELECT COUNT(*) AS n_pairs FROM (
      SELECT DISTINCT user_id, event_type FROM events
    )
    """,
)
def distinct_user_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates (identity emit-once reduce, §2.7)."""
    return (
        spark.table("events")
        .select("user_id", "event_type")
        .dropDuplicates()
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
