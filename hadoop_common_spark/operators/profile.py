"""Column profiling — the ANALYZE TABLE / data-quality audit shape.

A corpus pipeline profiles every ingest batch before spending cluster
time on it (null-rate spikes and cardinality collapse are the two
classic upstream-breakage signals). One pass over the table computes
per-column null counts, exact distinct counts, and min/max, emitted in
long format (one row per column) so the result is schema-stable no
matter which table is profiled.

Scale: a single full scan with one partial-aggregated reduce per
column batch — no per-column jobs (the naive DESCRIBE loop), no
collect. Distinct counts are the expensive part; ``approx`` swaps them
to HyperLogLog (approx_count_distinct) for the 100 TB tier where exact
per-column cardinality is a luxury.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None, approx: bool = False) -> DataFrame:
    """One row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_str, max_str). min/max aggregate in the column's NATIVE type and
    only the resulting scalar is stringified (so heterogeneous types
    stack in one long-format result) — casting before the aggregate
    would report lexicographic extremes ('100' < '99') and gut the
    range signal for every numeric/timestamp column."""
    cols = columns or df.columns
    ndv = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    # backtick-quoted lookups + positional _p{i} aliases: column names
    # with dots/spaces/quotes must not leak into parsed expressions
    # (dots are interpreted as struct access even by df[name])
    def ref(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    for i, c in enumerate(cols):
        aggs += [
            F.count(F.when(ref(c).isNull(), 1)).alias(f"_p{i}_nulls"),
            ndv(ref(c)).alias(f"_p{i}_ndv"),
            F.min(ref(c)).cast("string").alias(f"_p{i}_min"),
            F.max(ref(c)).cast("string").alias(f"_p{i}_max"),
        ]
    wide = df.agg(*aggs)
    # one wide row -> long format via stack (no second scan); the real
    # column name enters only as an escaped string literal
    stack_args = ", ".join(
        "'{}', _p{i}_nulls, _p{i}_ndv, _p{i}_min, _p{i}_max".format(
            c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct, min_str, max_str)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")
