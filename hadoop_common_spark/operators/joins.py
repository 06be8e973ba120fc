"""Join operators: N-way equi-joins, override join, semi/anti, theta,
broadcast map-side join, and the as-of join extension.

Reference:
- CompositeInputFormat join expression language
  ``inner(tbl(...),tbl(...))`` / ``outer(...)`` / ``override(...)``
  (lib/join/CompositeInputFormat.java:59-96, Parser.java) — map-side
  sort-merge join over co-sorted sources. Catalyst picks SMJ for large
  co-partitioned sides on its own; bucketed tables reproduce the
  "pre-sorted co-partitioned" precondition.
- InnerJoinRecordReader:54 (all sources must have the key),
  OuterJoinRecordReader (full outer, TupleWritable empty slots),
  OverrideRecordReader:35-77 (rightmost source wins per key).
- DataJoin reduce-side tagged join (hadoop-datajoin
  DataJoinReducerBase.java:47) — arbitrary-predicate capable.
- Map-side hash join via DistributedCache (DistributedCache.java:134) →
  broadcast hash join.
- Semi-join via Bloom filter (HC/util/bloom/BloomFilter.java:83) →
  left_semi (Spark injects runtime bloom filters itself).

Scale: N-way joins chain pairwise; AQE reorders/skew-splits. The as-of
join uses the union + conditional-window trick — one range-partition
shuffle, no per-key cross product, safe at 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def multiway_join(dfs: list[DataFrame], key: str, how: str = "inner") -> DataFrame:
    """N-ary equi-join on a shared key (CompositeInputFormat
    ``inner(...)``/``outer(...)`` with how='inner'/'full')."""
    return reduce(lambda a, b: a.join(b, on=key, how=how), dfs)


def override_join(dfs: list[DataFrame], key: str, value_col: str) -> DataFrame:
    """``override(S1,...,Sn)``: per key, the value from the *rightmost*
    source that has it (OverrideRecordReader.java:35-36,53,77). With
    duplicate keys, all rows of the winning source win (per-key, not
    per-row — TestJoinDatamerge semantics).

    Implementation: tag → union → keep rows whose tag equals the per-key
    max tag. One shuffle; no join explosion.
    """
    tagged = [
        df.select(F.col(key), F.col(value_col)).withColumn("_tag", F.lit(i))
        for i, df in enumerate(dfs)
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), tagged)
    w = Window.partitionBy(key)
    return (
        unioned.withColumn("_maxtag", F.max("_tag").over(w))
        .filter(F.col("_tag") == F.col("_maxtag"))
        .drop("_tag", "_maxtag")
    )


def broadcast_join(large: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """Map-side hash join: ship the small side to every task (the
    DistributedCache idiom made explicit)."""
    return large.join(F.broadcast(small), on, how)


def semi_join(df: DataFrame, keys_df: DataFrame, on) -> DataFrame:
    """EXISTS — the Bloom-filter/BloomMapFile membership idiom
    (HC/io/BloomMapFile.java:49) as a first-class join."""
    return df.join(keys_df, on, "left_semi")


def anti_join(df: DataFrame, keys_df: DataFrame, on) -> DataFrame:
    """NOT EXISTS — DataJoin with absent tag."""
    return df.join(keys_df, on, "left_anti")


def theta_join(left: DataFrame, right: DataFrame, predicate: Column, how: str = "inner") -> DataFrame:
    """Arbitrary-predicate join (DataJoinReducerBase.joinAndCollect
    :174-214 runs a nested loop per key group; Catalyst picks BNLJ or
    adds an equi-prefix when one exists in the predicate)."""
    return left.join(right, predicate, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """As-of join (engine extension; reference has none — SURVEY §2.4):
    for each left row, the latest right row with
    ``right_ts <= left_ts`` for the same key.

    Union + last(ignorenulls) window: O(n log n) sort within key
    partitions, no range cross-product. The idiomatic 100 TB-safe plan.
    """
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            *[F.col(c) for c in right_value_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    for c in right_value_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal ts so a tie matches
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in right_value_cols:
        out = out.withColumn(
            c + "_asof",
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return (
        out.filter(F.col("_side") == 1)
        .drop("_ts", "_side", *right_value_cols)
    )
