"""The aggregate-framework DSL: descriptor-driven aggregation.

Reference: MRC/mapreduce/lib/aggregate/* — a generic mapper/combiner/
reducer interprets ``aggregator:type:id`` descriptor strings and applies
the named aggregator per key (dispatch table at
ValueAggregatorBaseDescriptor.java:39-117, job factory
ValueAggregatorJob.java:119). The eight aggregator types map to Column
expressions; partial/final split (the reference's combiner,
MapTask.java:1009) is automatic in Catalyst's HashAggregate.

``UniqValueCount``'s item cap (UniqValueCount.java:63) truncates the set
*during accumulation* in the reference — order-dependent and
nondeterministic under parallel merge. Our semantics: exact distinct
count, with the cap applied to a deterministically sorted value set
(documented deviation, SURVEY.md §7.3).

``ValueHistogram`` (ValueHistogram.java:83-120) reports, per key:
#distinct values, min/median/max/mean/stddev of the per-value counts.
That is two-level aggregation — see :func:`value_histogram`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_common_spark.functions.exact import dsum


def _uniq_value_count(c: Column, cap: int | None = None) -> Column:
    if cap is None:
        return F.countDistinct(c)
    return F.least(F.countDistinct(c), F.lit(cap)).cast("bigint")


AGGREGATORS: dict[str, Callable[..., Column]] = {
    # reference: LongValueSum.java
    "LongValueSum": lambda c: F.sum(c.cast("long")),
    # reference: DoubleValueSum.java — exact decimal sum for stability
    "DoubleValueSum": lambda c: dsum(c),
    # reference: LongValueMax.java / LongValueMin.java
    "LongValueMax": lambda c: F.max(c.cast("long")),
    "LongValueMin": lambda c: F.min(c.cast("long")),
    # reference: StringValueMax.java / StringValueMin.java (lexicographic)
    "StringValueMax": lambda c: F.max(c.cast("string")),
    "StringValueMin": lambda c: F.min(c.cast("string")),
    # reference: UniqValueCount.java (with optional cap)
    "UniqValueCount": _uniq_value_count,
    # ValueHistogram is structurally different → value_histogram()
}


def aggregate_job(
    df: DataFrame,
    key_cols: list[str],
    specs: list[tuple[str, str, str] | tuple[str, str, str, int]],
) -> DataFrame:
    """Run a descriptor-driven aggregation: one ``groupBy().agg()``.

    ``specs`` entries are ``(out_name, aggregator_type, column[, cap])``
    — the Spark translation of ``aggregator:type:id`` descriptor strings
    (ValueAggregatorBaseDescriptor.generateEntry, :99-117).
    """
    aggs = []
    for spec in specs:
        out_name, agg_type, col = spec[0], spec[1], spec[2]
        fn = AGGREGATORS.get(agg_type)
        if fn is None:
            raise ValueError(f"unknown aggregator type: {agg_type!r}")
        if len(spec) == 4:
            aggs.append(fn(F.col(col), spec[3]).alias(out_name))
        else:
            aggs.append(fn(F.col(col)).alias(out_name))
    return df.groupBy(*key_cols).agg(*aggs)


def value_histogram(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """Per-key histogram report over value frequencies
    (ValueHistogram.getReport, ValueHistogram.java:83-120):
    #distinct values and min/median/max/mean/stddev of the counts.

    Two chained aggregations — both stay in HashAggregate; the second
    input (one row per distinct (key,value)) is already small.
    Median reproduces the reference exactly: ValueHistogram.getReport
    scans the SORTED count list and reports element [length/2]
    (0-based → upper-middle for even lengths, NO interpolation), so the
    median is one of the actual counts, not percentile()'s midpoint.
    Stddev is population stddev over integer counts via exact sums.
    """
    counts = df.groupBy(*key_cols, value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    n = F.count("_cnt")
    s = F.sum("_cnt")
    sq = F.sum(F.col("_cnt") * F.col("_cnt"))
    median = F.element_at(
        F.array_sort(F.collect_list("_cnt")), (F.floor(n / 2) + 1).cast("int")
    )
    return counts.groupBy(*key_cols).agg(
        n.alias("n_distinct_values"),
        F.min("_cnt").alias("min_count"),
        median.alias("median_count"),
        F.max("_cnt").alias("max_count"),
        (s.cast("double") / n.cast("double")).alias("mean_count"),
        F.sqrt(
            (sq.cast("double") - s.cast("double") * s.cast("double") / n.cast("double"))
            / n.cast("double")
        ).alias("stddev_count"),
    )


def ohlc_aggregate(
    df: DataFrame,
    group_cols: list[str],
    sec_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """OHLC partial state per group: (group_cols..., _o, _c, high, low,
    n_events) with open/close carried through ONE struct-min/struct-max
    over the tie-free (sec, id, value) tuple — the relational
    keep-first/keep-last, no window. Every component is a MONOID
    (min/max/sum), which is what makes the state stream-maintainable:
    fold micro-batches with :func:`ohlc_merge` and the result equals
    the batch aggregate of everything ingested, exactly."""
    tup = F.struct(
        F.col(sec_col).alias("s"), F.col(id_col).alias("i"),
        F.col(value_col).alias("v"),
    )
    return df.groupBy(*group_cols).agg(
        F.min(tup).alias("_o"),
        F.max(tup).alias("_c"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


def ohlc_merge(states: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge OHLC partial states (the monoid op): min first-tuple, max
    last-tuple, max high, min low, summed count."""
    return states.groupBy(*group_cols).agg(
        F.min("_o").alias("_o"),
        F.max("_c").alias("_c"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )


def ohlc_finalize(states: DataFrame) -> DataFrame:
    """Project the user-facing bar columns from the mergeable state."""
    # drop bookkeeping columns (e.g. the streaming maintainer's _bid
    # replay high-water mark) along with the internal tuples
    keep = [
        c for c in states.columns
        if c not in ("_o", "_c") and not c.startswith("_")
    ]
    front = [c for c in keep if c not in ("high", "low", "n_events")]
    return states.select(
        *front,
        F.col("_o.v").alias("open"),
        "high",
        "low",
        F.col("_c.v").alias("close"),
        "n_events",
    )
