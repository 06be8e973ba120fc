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
    direction: str = "backward",
    tolerance: int | None = None,
    right_tie_col: str | None = None,
) -> DataFrame:
    """As-of join (engine extension; reference has none — SURVEY §2.4).

    ``direction='backward'`` (default): for each left row, the latest
    right row with ``right_ts <= left_ts`` for the same key.
    ``direction='forward'``: the earliest right row with
    ``right_ts >= left_ts`` (ties at equal ts match in both directions).

    ``tolerance`` (same units as the ts columns — use numeric/epoch
    columns when setting it): matches farther than ``tolerance`` from the
    left ts are nulled out, the pandas ``merge_asof`` contract.

    ``right_tie_col``: deterministic tie-break among right rows sharing
    (key, ts) — backward keeps the max tie value, forward the min (both
    = "the one nearest the boundary" in the combined sort order). Without
    it, equal-ts right rows resolve by partition order (nondeterministic
    under re-partitioning) — always pass it when duplicates are possible.

    Union + last/first(ignorenulls) window: O(n log n) sort within key
    partitions, no range cross-product. The idiomatic 100 TB-safe plan.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    reserved = {"_ts", "_side", "_m", "_tie"}
    held = reserved.intersection(left.columns).union(reserved.intersection(right_value_cols))
    if held:
        # a left column named _tie would be matched by unionByName and
        # then silently dropped at the end (and _ts/_side would be
        # overwritten) — refuse rather than corrupt
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)}; rename {sorted(held)}"
        )
    if right_tie_col is not None and right_tie_col not in right.columns:
        # without this check the tie expression would resolve against the
        # unioned frame — binding to a same-named LEFT column (NULL for
        # every right row) and silently restoring the nondeterministic
        # tie-break the parameter exists to prevent
        raise ValueError(f"right_tie_col {right_tie_col!r} not in right columns")
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            *[F.col(c) for c in right_value_cols],
            # tie column projected explicitly under a reserved name — it
            # need not be (and usually isn't) one of the value columns
            *([F.col(right_tie_col).alias("_tie")] if right_tie_col else []),
        )
        .withColumn("_side", F.lit(0))
    )
    clash = [c for c in right_value_cols if c in left.columns]
    if clash:
        # silently proceeding would mix the left table's own values into
        # the union rows AND drop the left column at the end — require
        # the caller to rename (merge_asof would suffix)
        raise ValueError(
            f"right_value_cols {clash} collide with left columns — "
            "alias the right side before the as-of join"
        )
    for c in right_value_cols:
        lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    # allowMissingColumns: lt has no _tie — union fills NULL for left rows
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    tie = (
        F.when(F.col("_side") == 0, F.col("_tie"))
        if right_tie_col
        else F.lit(0)
    )
    if direction == "backward":
        # rights sort before lefts at equal ts (so a tie matches); the
        # frame ends at the current row and last() picks the nearest
        # preceding right — among equal-ts rights, the max tie value
        order = [F.col("_ts").asc(), F.col("_side").asc(), tie.asc_nulls_first()]
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        # lefts sort before rights at equal ts; the frame starts at the
        # current row and first() picks the nearest following right —
        # among equal-ts rights, the min tie value
        order = [F.col("_ts").asc(), F.col("_side").desc(), tie.asc_nulls_first()]
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    w = Window.partitionBy(on).orderBy(*order).rowsBetween(*frame)
    # ONE struct pick, not one ignorenulls pick per value column: a right
    # row whose value is NULL must still be "the match" (per-column picks
    # would skip past it to a farther row, tearing the matched row apart
    # and leaking values from beyond the tolerance). The struct is
    # non-null for every right row, so last/first lands on the same row
    # for the ts and every value.
    payload = F.when(
        F.col("_side") == 0,
        F.struct(F.col("_ts").alias("_mts"), *[F.col(c) for c in right_value_cols]),
    )
    out = unioned.withColumn("_m", pick(payload).over(w))
    within = (
        F.col("_m").isNotNull()
        if tolerance is None
        else F.abs(F.col("_m")["_mts"] - F.col("_ts")) <= tolerance
    )
    for c in right_value_cols:
        out = out.withColumn(c + "_asof", F.when(within, F.col("_m")[c]))
    return (
        out.filter(F.col("_side") == 1)
        .drop("_ts", "_side", "_m", "_tie", *right_value_cols)
    )
