"""Time-window queries over `events` — batch formulations of the
streaming operators (SURVEY.md §2.10).

The reference is batch-only (no watermarks/windows/state anywhere in
MapReduce); these queries define the window *semantics* on the batch
path, and hadoop_common_spark.streaming re-exposes the same windows via
Structured Streaming (readStream + withWatermark). Keeping the oracle on
the batch form is exactly the §2.10 plan: every streaming op has a
batch-equivalent formulation DuckDB can check.

Window keys are epoch-second bigints (not timestamps): integer bucket
math is identical in every engine and timezone-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_common_spark.functions.exact import dsum, dsum_sql
from hadoop_common_spark.queries import query

EPOCH = "CAST(ts AS LONG)"  # spark: seconds, floor
EPOCH_SQL = "CAST(floor(epoch(ts)) AS BIGINT)"


@query(
    "window_tumbling_hourly",
    oracle=f"""
    SELECT ({EPOCH_SQL} // 3600) * 3600 AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window per event_type (streaming:
    ``groupBy(window(ts, '1 hour'), event_type)`` — see streaming/jobs.py)."""
    df = spark.table("events")
    bucket = (F.expr(f"{EPOCH} div 3600") * 3600).alias("window_start")
    return df.groupBy(bucket, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
    )


@query(
    "window_sliding_10m_5m",
    oracle=f"""
    SELECT window_start, COUNT(*) AS n_events
    FROM (
      SELECT unnest([
               ({EPOCH_SQL} // 300) * 300 - 300,
               ({EPOCH_SQL} // 300) * 300
             ]) AS window_start
      FROM events
    )
    GROUP BY window_start
    """,
)
def window_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window, 10 min size / 5 min slide: each event lands in the
    two windows covering it (explode of window starts — exactly Spark's
    streaming `window(ts, '10 minutes', '5 minutes')` expansion)."""
    df = spark.table("events")
    s1 = F.expr(f"({EPOCH} div 300) * 300")
    return (
        df.select(F.explode(F.array(s1 - 300, s1)).alias("window_start"))
        .groupBy("window_start")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "window_sessionize",
    oracle=f"""
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MAX(e) - MIN(e) AS duration_s
    FROM (
      SELECT user_id, e,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY e, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM (
        SELECT user_id, event_id, e,
               CASE WHEN e - lag(e) OVER (PARTITION BY user_id ORDER BY e, event_id) > 1800
                    OR lag(e) OVER (PARTITION BY user_id ORDER BY e, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM (SELECT user_id, event_id, {EPOCH_SQL} AS e FROM events)
      )
    )
    GROUP BY user_id, session_id
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min gap): lag → new-session flag →
    running sum = session id → per-session stats. The batch equivalent of
    streaming ``session_window(ts, '30 minutes')``; one shuffle on
    user_id, everything else window functions."""
    df = spark.table("events").select(
        "user_id", "event_id", F.expr(EPOCH).alias("e")
    )
    w = Window.partitionBy("user_id").orderBy("e", "event_id")
    lagged = df.withColumn("_prev", F.lag("e").over(w))
    flagged = lagged.withColumn(
        "new_sess",
        F.when(
            F.col("_prev").isNull() | (F.col("e") - F.col("_prev") > 1800), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("e") - F.min("e")).alias("duration_s"),
    )


@query(
    "window_user_running_total",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER (
             PARTITION BY user_id ORDER BY {EPOCH_SQL}, event_id
             ROWS UNBOUNDED PRECEDING
           ) AS DOUBLE) AS running_value
    FROM events
    """,
)
def window_user_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total ordered by time — the cumulative-state shape
    of a stateful streaming operator, as a batch window (exact decimal
    accumulation so every prefix matches bit-for-bit)."""
    df = spark.table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr(EPOCH), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(30,6)")).over(w).cast("double").alias("running_value"),
    )


_ANALYTICS_ORACLE = """
SELECT user_id, event_id,
       lag(value)  OVER w_ts AS prev_value,
       lead(value) OVER w_ts AS next_value,
       dense_rank()   OVER w_val AS value_rank,
       ntile(4)       OVER w_ts  AS quartile,
       percent_rank() OVER w_val AS pct_rank
FROM events
WHERE user_id < 50
WINDOW w_ts  AS (PARTITION BY user_id ORDER BY ts, event_id),
       w_val AS (PARTITION BY user_id ORDER BY value DESC, event_id)
"""


@query("window_user_analytics", oracle=_ANALYTICS_ORACLE)
def window_user_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-function family (lag/lead/dense_rank/ntile/
    percent_rank) over per-user event history — the reference's
    secondary-sort idiom (composite key + grouping comparator,
    EX/SecondarySort.java:103) generalized to ranked/offset access.
    Both orderings share ONE exchange on user_id (two in-partition
    sorts); every ordering is tie-broken by event_id so ranks are
    deterministic."""
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        spark.table("events")
        .filter(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            F.lag("value").over(w_ts).alias("prev_value"),
            F.lead("value").over(w_ts).alias("next_value"),
            F.dense_rank().over(w_val).alias("value_rank"),
            F.ntile(4).over(w_ts).alias("quartile"),
            F.percent_rank().over(w_val).alias("pct_rank"),
        )
    )


_ATTRIBUTION_ORACLE = """
SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
       CAST(floor(epoch(v.ts)) AS BIGINT) AS view_epoch
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id
 AND v.ts >= c.ts - INTERVAL 10 MINUTE
 AND v.ts <= c.ts
"""


@query("view_click_attribution", oracle=_ATTRIBUTION_ORACLE)
def view_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join (click→view attribution over a 10-minute
    lookback): the batch twin of the stream-stream watermarked join in
    streaming/jobs.py::view_click_attribution_stream. Equi key (user_id)
    + range predicate: Spark shuffles both sides on user_id once and the
    range filter runs post-join inside the same stage — no cross join,
    no quadratic blow-up beyond per-user fan-out, at any scale."""
    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    return (
        clicks.join(
            views,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("c_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("v_ts") <= F.col("c_ts")),
        )
        .select(
            "user_id",
            "click_id",
            "view_id",
            F.col("c_ts").cast("long").alias("click_epoch"),
            F.col("v_ts").cast("long").alias("view_epoch"),
        )
    )
