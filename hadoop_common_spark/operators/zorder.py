"""Z-order (Morton) clustering — the data-layout operator for
multi-dimensional file skipping.

A 100 TB corpus is usually range-partitioned on ONE key (time), so
filters on any other column read everything. Writing files in Z-order of
k columns bounds every file's min/max range on ALL k columns at once, so
parquet row-group pruning works for each of them (the published
lakehouse OPTIMIZE ZORDER BY). There is no custom execution here:
compute the interleaved key, ``repartitionByRange(zkey)`` +
``sortWithinPartitions(zkey)``, write — every piece is stock Spark.

The key is pure integer arithmetic (rank each column to [0, 2^bits) by
min/max scaling, interleave bits) — deterministic, engine-portable,
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_expr(col: str, lo: Column, hi: Column, bits: int) -> Column:
    """Scale col to [0, 2^bits - 1] by min/max (floor; constant column →
    0). Integer math after one double division — the rounding is floor
    in both Spark and DuckDB."""
    span = (hi - lo).cast("double")
    maxv = F.lit((1 << bits) - 1)
    scaled = F.floor(
        (F.col(col) - lo).cast("double") / F.when(span > 0, span).otherwise(F.lit(1.0))
        * maxv.cast("double")
    ).cast("bigint")
    return F.least(F.greatest(scaled, F.lit(0)), maxv.cast("bigint"))


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Add ``zkey``: the Morton interleave of ``cols`` (each min/max
    scaled to ``bits`` bits). Ranges are computed in one tiny aggregate
    and joined back as a broadcast scalar — one extra narrow pass, no
    shuffle of ``df`` beyond what the caller does with the key.

    Bit i of column j lands at position i * k + j: shift-and-mask with
    literal constants only (Spark 4 has no Column << operator)."""
    k = len(cols)
    if k * bits > 62:
        # bit position k*bits-1 must stay below the sign bit of the
        # bigint key: 2 cols at 16 bits uses positions 0..31; 4 cols at
        # the default 16 would need 1 << 63 and overflow
        raise ValueError(
            f"{k} columns x {bits} bits = {k * bits} key bits > 62; "
            f"lower bits to <= {62 // k}"
        )
    ranges = df.agg(
        *[f for c in cols for f in (
            F.min(c).cast("bigint").alias(f"_lo_{c}"),
            F.max(c).cast("bigint").alias(f"_hi_{c}"),
        )]
    )
    out = df.crossJoin(F.broadcast(ranges))
    scaled = [
        _scale_expr(c, F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits) for c in cols
    ]
    zkey = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, s in enumerate(scaled):
            # (s >> i & 1) << (i*k + j) with literal multipliers; explicit
            # floor (not cast) — division by 2^i is exact in binary FP and
            # floor matches DuckDB (CAST AS BIGINT there rounds half-even)
            bit = F.floor(s / F.lit(float(1 << i))).cast("bigint") % 2
            zkey = zkey + bit * F.lit(1 << (i * k + j))
    return out.withColumn("zkey", zkey).drop(
        *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols]
    )
