"""Sort / secondary-sort / top-k queries (SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_common_spark.operators.keyspec import keyspec_sort_columns
from hadoop_common_spark.operators.sort import top_k, top_k_per_group
from hadoop_common_spark.queries import query


@query(
    "total_order_sort_head",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, rank FROM (
      SELECT l_orderkey, l_linenumber, l_shipdate,
             ROW_NUMBER() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rank
      FROM lineitem
    ) WHERE rank <= 100
    """,
)
def total_order_sort_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order sort (EX/Sort.java + TotalOrderPartitioner): the first
    100 rows of the global order, with their global rank. The full-table
    operator is total_order_sort() (repartitionByRange — Spark's sampled
    RangePartitioner = InputSampler.writePartitionFile); here limit+rank
    keeps the oracle comparison bounded."""
    df = spark.table("lineitem")
    cols = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    head = top_k(df.select("l_orderkey", "l_linenumber", "l_shipdate"), 100, cols)
    w = Window.orderBy(*cols)
    return head.withColumn("rank", F.row_number().over(w))


@query(
    "secondary_sort_window",
    oracle="""
    SELECT l_orderkey, rn, l_partkey, l_quantity FROM (
      SELECT l_orderkey, l_partkey, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_shipdate, l_linenumber, l_partkey, l_quantity) AS rn
      FROM lineitem
    )
    """,
)
def secondary_sort_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort, window formulation (EX/SecondarySort.java:103-145:
    composite key + grouping comparator → values ordered within key).
    One shuffle on the group key; no group materialization — the 100 TB
    formulation."""
    # (shipdate, linenumber) is not unique within an order in this data;
    # include every output column in the sort key so any remaining ties are
    # between identical rows (order within them is then unobservable).
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_shipdate", "l_linenumber", "l_partkey", "l_quantity"
    )
    return (
        spark.table("lineitem")
        .withColumn("rn", F.row_number().over(w))
        .select("l_orderkey", "rn", "l_partkey", "l_quantity")
    )


@query(
    "secondary_sort_collected",
    oracle="""
    SELECT l_orderkey,
           string_agg(l_linenumber, ',' ORDER BY l_shipdate, l_linenumber) AS lines_in_ship_order
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def secondary_sort_collected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort, collected formulation: per key, values concatenated
    in secondary order — the literal reducer-input view
    (ReduceContextImpl.java:131-183). Materializes each group (BackupStore
    analog); prefer the window form for huge groups."""
    df = spark.table("lineitem")
    return df.groupBy("l_orderkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("l_shipdate", "l_linenumber"))
                ),
                lambda s: s["l_linenumber"].cast("string"),
            ),
        ).alias("lines_in_ship_order")
    )


@query(
    "keyspec_sort_head",
    oracle="""
    SELECT line, rank FROM (
      SELECT line,
             ROW_NUMBER() OVER (
               ORDER BY string_split(line, chr(9))[2] ASC,
                        CAST(string_split(line, chr(9))[3] AS DOUBLE) DESC
             ) AS rank
      FROM (SELECT (user_id || chr(9) || event_type || chr(9) || event_id) AS line FROM events)
    ) WHERE rank <= 200
    """,
)
def keyspec_sort_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unix-sort key specs '-k2,2 -k3,3nr' (KeyFieldBasedComparator
    :39-49): sort tab-delimited lines by field 2 asc, field 3 numeric
    desc. The spec parser compiles to orderBy Columns; field 3 (event_id)
    is unique so the order is total."""
    df = spark.table("events").select(
        F.concat_ws("\t", "user_id", "event_type", "event_id").alias("line")
    )
    cols = keyspec_sort_columns(["-k2,2", "-k3,3nr"], "line")
    head = df.orderBy(*cols).limit(200)
    return head.withColumn("rank", F.row_number().over(Window.orderBy(*cols)))


@query(
    "top_k_events",
    oracle="""
    SELECT event_id, user_id, value FROM events
    ORDER BY value DESC, event_id ASC
    LIMIT 50
    """,
)
def top_k_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (single-reducer idiom, EX/Grep.java:87) →
    TakeOrderedAndProject: per-partition heaps, no global sort."""
    return top_k(
        spark.table("events").select("event_id", "user_id", "value"),
        50,
        [F.desc("value"), F.asc("event_id")],
    )


@query(
    "top_k_per_group",
    oracle="""
    SELECT event_type, event_id, value FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def top_k_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k via window rank — one shuffle on the group key."""
    return top_k_per_group(
        spark.table("events").select("event_type", "event_id", "value"),
        ["event_type"],
        3,
        [F.desc("value"), F.asc("event_id")],
    )


_Z_BITS = 16


def _zorder_oracle(bits: int = _Z_BITS, k: int = 2) -> str:
    """Mirror of operators/zorder.zorder_key for (user_id, ts-epoch):
    min/max scale each dim to ``bits`` bits (FLOOR — DuckDB CAST rounds),
    interleave with literal power-of-two multipliers."""
    maxv = (1 << bits) - 1

    def scaled(c: str, lo: str, hi: str) -> str:
        span = f"CAST({hi} - {lo} AS DOUBLE)"
        return (
            f"LEAST(GREATEST(CAST(FLOOR(CAST({c} - {lo} AS DOUBLE) / "
            f"(CASE WHEN {span} > 0 THEN {span} ELSE 1.0 END) * {maxv}.0) AS BIGINT), 0), {maxv})"
        )

    s0 = scaled("user_id", "lo0", "hi0")
    s1 = scaled("e_ts", "lo1", "hi1")
    terms = []
    for i in range(bits):
        for j, s in enumerate((s0, s1)):
            terms.append(
                f"CAST(FLOOR({s} / {float(1 << i)}) AS BIGINT) % 2 * {1 << (i * k + j)}"
            )
    zkey = " + ".join(terms)
    return f"""
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS e_ts FROM events
),
r AS (
  SELECT CAST(MIN(user_id) AS BIGINT) AS lo0, CAST(MAX(user_id) AS BIGINT) AS hi0,
         CAST(MIN(e_ts) AS BIGINT) AS lo1, CAST(MAX(e_ts) AS BIGINT) AS hi1
  FROM e
)
SELECT event_id, CAST({zkey} AS BIGINT) AS zkey FROM e, r
"""


@query("zorder_layout_keys", oracle=_zorder_oracle())
def zorder_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over (user_id, event time) — the
    data-layout op behind multi-dimensional file skipping: write files in
    zkey order and every file carries tight min/max on BOTH columns, so
    parquet row-group pruning serves time filters AND user filters from
    the same layout (single-key range partitioning serves only one). The
    key is min/max scaling + bit interleave — pure integer expressions at
    scan speed; ranges come from one broadcast 1-row aggregate."""
    from hadoop_common_spark.operators.zorder import zorder_key

    e = spark.table("events").select(
        "event_id", "user_id", F.expr("CAST(ts AS LONG)").alias("e_ts")
    )
    return zorder_key(e, ["user_id", "e_ts"], bits=_Z_BITS).select("event_id", "zkey")
