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


def range_self_join_binned(
    df: DataFrame,
    id_col: str,
    value_col: str,
    width: float,
    block_cols: list[str] | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Self range join — all pairs with ``|value_a - value_b| <= width``
    (within optional block columns), WITHOUT the theta-join nested loop.

    Spark plans a bare ``|a.v - b.v| <= w`` predicate as a
    BroadcastNestedLoopJoin / cartesian — O(N²) probes, dead at scale.
    The standard relational fix is BINNING: bucket each row at
    ``floor(value / width)``; any qualifying pair's bins differ by at
    most 1, so probing (bin-1, bin, bin+1) — implemented as a 3-way
    explode on ONE side only — turns the range predicate into an
    equi-join Catalyst hash-partitions, then the exact |Δ| <= width
    filter prunes false bin neighbors. Fan-out is 3× one side + bin
    occupancy, never N².

    Emits (id_a < id_b, value_a, value_b) with each qualifying pair
    exactly once: the probe side explodes to 3 bins, the build side
    keeps its own bin, so a pair matches on exactly one (probe_bin ==
    build_bin) row.

    Scale notes: bin occupancy is the skew knob (width too large →
    hot bins; split width or salt within bins); block_cols (user, key,
    partition) bound the join the same way lang blocks bound the text
    joins. This is the batch form of the stream-stream interval join
    (streaming/jobs.view_click_attribution_stream) — same binning idea
    Spark's watermarked symmetric hash join applies in time."""
    blocks = list(block_cols or [])
    v = F.col(value_col).cast("double")
    base = df.select(
        *blocks, F.col(id_col), v.alias("_v"), F.floor(v / F.lit(width)).alias("_bin")
    )
    probe = base.select(
        *blocks,
        F.col(id_col).alias(id_a),
        F.col("_v").alias("_va"),
        F.explode(
            F.array(F.col("_bin") - 1, F.col("_bin"), F.col("_bin") + 1)
        ).alias("_bin"),
    )
    build = base.select(
        *blocks, F.col(id_col).alias(id_b), F.col("_v").alias("_vb"), "_bin"
    )
    return (
        # NO merge hint (r13 A/B, unlike the dedup sparse self-joins):
        # pinning SMJ here measured neutral-warm / worse-cold at the
        # 100x tier (9.96/3.66/3.84s vs 8.46/3.76/3.91s BHJ) — the
        # narrow (block, id, v, bin) build side hashes cheaply, so the
        # planner's broadcast is the right local call and AQE will
        # demote it itself once real-scale stats exceed the threshold.
        probe.join(build, blocks + ["_bin"])
        .filter(
            (F.col(id_a) < F.col(id_b))
            & (F.abs(F.col("_va") - F.col("_vb")) <= F.lit(float(width)))
        )
        .select(id_a, id_b, F.col("_va").alias("value_a"), F.col("_vb").alias("value_b"))
    )


def interval_lookup_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval lookup join — every (point, interval) pair with
    ``lo <= point <= hi`` (within optional block columns), WITHOUT the
    BroadcastNestedLoopJoin Spark plans for a bare BETWEEN theta
    predicate. The two-table generalization of
    :func:`range_self_join_binned` — the IP-geolocation / price-band /
    genomic-interval lookup shape.

    BINNING: each interval explodes to every bin its [lo, hi] span
    covers (``sequence(floor(lo/w), floor(hi/w))``); each point keeps
    its single bin ``floor(v/w)``; the equi-join on (blocks, bin)
    hash-partitions, and the exact BETWEEN filter prunes bin-edge false
    candidates. A qualifying pair matches on exactly one bin — the
    point's own — so no post-join dedup is needed.

    Scale: interval fan-out is ceil(span / bin_width) + 1, so pick
    bin_width near the typical interval span (fan-out ~2) — the knob
    trades interval duplication against point-bin occupancy. Both
    inputs shuffle ONCE on (blocks, bin); output volume is true match
    cardinality, never |points| x |intervals|. Skewed hot bins (many
    intervals covering one popular value) salt the same way hot keys
    do everywhere else.

    Returns points columns + interval columns (both sides' non-block
    columns must not collide; block columns appear once).

    BREAKING (r7): non-block column collisions now raise ValueError up
    front. Earlier rounds let collisions through when the colliding
    columns happened to be unused in the join predicate (the output then
    carried ambiguous duplicate names); the docstring always forbade
    them, but callers relying on that leniency must now ``.drop()`` or
    rename the colliding passthrough columns on one side first.
    """
    blocks = list(block_cols or [])
    clash = sorted(
        (set(points.columns) & set(intervals.columns)) - set(blocks)
    )
    if clash:
        # fail fast with the actual names: letting these through yields
        # either a confusing ambiguous-reference error at the BETWEEN
        # filter, or (if lo/hi/point themselves collide) a silently
        # wrong filter on the other side's column
        raise ValueError(
            "interval_lookup_join_binned: non-block column collision "
            f"between points and intervals: {clash}; rename or drop "
            "them on one side first"
        )
    w = float(bin_width)
    p = points.withColumn(
        "_bin", F.floor(F.col(point_col).cast("double") / F.lit(w))
    )
    # drop inverted intervals BEFORE the explode: they match nothing, and
    # sequence(start, stop) with start > stop would otherwise generate a
    # DESCENDING bin list — |lo-hi|/w useless rows per bad interval
    iv = intervals.filter(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col).cast("double") / F.lit(w)),
                F.floor(F.col(hi_col).cast("double") / F.lit(w)),
            )
        ),
    )
    return (
        p.join(iv, blocks + ["_bin"])
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bin")
    )
