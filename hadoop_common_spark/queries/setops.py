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


# Audience overlap (r6) — set similarity at the GROUP level: exact
# Jaccard between the user sets of every event-type pair. The product
# analytics / audience-segmentation shape ("how much do clickers and
# purchasers overlap"), and the set-op family's aggregate member:
# intersect/except compare two fixed relations, this compares ALL pairs
# of grouped sets in one plan.
_OVERLAP_ORACLE = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_common, sa.n AS n_a, sb.n AS n_b,
       CAST(n_common AS DOUBLE)
         / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.event_type = type_a
JOIN sizes sb ON sb.event_type = type_b
"""


@query("events_audience_overlap", oracle=_OVERLAP_ORACLE)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise exact Jaccard of per-event-type user sets. Scale: ONE
    distinct over (type, user) — the only pass that touches raw rows;
    the intersection self-join keys on user_id with fan-out bounded by
    each user's type count squared (<= |types|², tiny and data-
    independent); sizes and intersections are partial-aggregated to at
    most |types|² rows before the final joins. The jaccard double is a
    single division of exact BIGINTs — bit-identical on both engines.
    Contrast with dedup's MinHash tier: at millions of GROUPS you'd
    switch to minhash_signature over the same (group, member) stream;
    at a handful of segments the exact form is one cheap plan."""
    tu = spark.table("events").select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a", "type_b", "n_common", "n_a", "n_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )
