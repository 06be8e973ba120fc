"""Relational count-min sketch — the mergeable heavy-hitter tier.

The reference's closest artifact is the Bloom membership idiom
(HC/util/bloom/CountingBloomFilter.java — per-bucket counters over
hashed positions); count-min (Cormode & Muthukrishnan 2005) is the
frequency-query generalization every 100 TB token-statistics pipeline
uses when the exact `groupBy(token).count()` vocabulary shuffle is the
bottleneck.

Expressed relationally instead of as an opaque binary blob (PySpark 4
dropped `df.stat.countMinSketch`, and a blob can't be oracle-checked):

- **Build**: each element explodes into `depth` (row, bucket) cells
  (bucket = md5-derived hash of the value, salted by row) and one
  groupBy sums cell counts. The sketch IS a DataFrame of at most
  depth×width rows — tiny, broadcastable, and mergeable by unioning
  sketches and re-summing (the streaming/incremental path).
- **Estimate**: probe values re-derive their cells, left-join the
  sketch, and take the per-value MIN over rows — the classic CMS upper
  bound (never undercounts; overcounts ≤ eps·N with prob 1-δ for
  width=⌈e/eps⌉, depth=⌈ln(1/δ)⌉).

Hashes are md5-derived, so the sketch is a pure deterministic function
of the data — DuckDB rebuilds the identical sketch and the differential
oracle checks the *estimates*, not just bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX15 = 15  # 15 hex chars = 60 bits, safely inside bigint


def _bucket(value: Column, row: int, width: int) -> Column:
    h = F.md5(F.concat(F.lit(f"cms{row}:"), value.cast("string")))
    return F.conv(F.substring(h, 1, HEX15), 16, 10).cast("bigint") % width


def _bucket_sql(expr: str, row: int, width: int) -> str:
    return (
        f"('0x' || substr(md5('cms{row}:' || CAST({expr} AS VARCHAR)), 1, {HEX15}))::BIGINT"
        f" % {width}"
    )


def cms_build(df: DataFrame, col: str, width: int = 1024, depth: int = 4) -> DataFrame:
    """(row, bucket, cnt) sketch of the multiset in ``col``. One explode
    (×depth) + one partial-aggregated shuffle whose key space is bounded
    by depth×width — constant-size output at any input scale."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_c")
    ).select("_c.row", "_c.bucket")
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Estimated count per probe value: min over the value's depth cells.
    The sketch is depth×width rows at most — broadcast it; probing is a
    narrow map + broadcast join, no shuffle of the probe set beyond its
    own dedup."""
    cells = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_c"),
    ).select(col, "_c.row", "_c.bucket")
    joined = cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        joined.groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
