"""User-defined aggregation surface — the reference's plugin APIs
rebuilt on pandas UDAFs and grouped pandas maps.

Reference parity (SURVEY.md §2.9):
- ``UserDefinedValueAggregatorDescriptor`` (lib/aggregate/
  UserDefinedValueAggregatorDescriptor.java): user plugs a custom
  aggregator class into the descriptor DSL → :func:`register_aggregator`
  extends the same ``AGGREGATORS`` table our agg-spec translator uses.
- ``Reducer.reduce`` (mapreduce/Reducer.java:147): a group of values →
  0..N output records → :func:`reduce_groups` (``applyInPandas``), with
  the secondary-sort contract (values ordered within the group,
  ReduceContextImpl.java:131-157) as an explicit ``sort_within`` option.

Scale notes: a pandas UDAF ships Arrow batches to Python per group —
10-100× faster than row UDFs but still off-JVM; the registry keeps
built-in Column aggregators first-class so only genuinely custom math
pays that cost. ``applyInPandas`` materializes each group in memory
(unlike the reference's streamed value iterator) — groups must fit an
executor; prefer window functions for ordered-group logic at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_common_spark.operators.aggregate import AGGREGATORS


def register_aggregator(name: str, fn: Callable[..., Column]) -> None:
    """Plug a custom aggregator into the agg-spec DSL (the
    UserDefinedValueAggregatorDescriptor surface). ``fn`` maps a Column
    (plus optional args) to an aggregate Column — either built from
    built-in functions or a pandas UDAF."""
    if name in AGGREGATORS:
        raise ValueError(f"aggregator {name!r} already registered")
    AGGREGATORS[name] = fn


def pandas_udaf(return_type: str):
    """Declare a pandas Series → scalar UDAF (Arrow-batched GROUPED_AGG),
    usable in ``groupBy().agg()`` and registrable via
    :func:`register_aggregator`.

        @pandas_udaf("double")
        def geo_mean(v: pd.Series) -> float:
            return float(np.exp(np.log(v[v > 0]).mean()))
    """

    def deco(fn):
        # Series -> scalar signature (via type hints) marks this as a
        # grouped-agg UDAF in the modern pandas_udf API.
        return F.pandas_udf(fn, return_type)

    return deco


def reduce_groups(
    df: DataFrame,
    key_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str,
    sort_within: list[str] | None = None,
) -> DataFrame:
    """The full ``Reducer.reduce`` surface: per key group, an arbitrary
    pandas transform emitting 0..N rows (UDAF- and UDTF-shaped at once).

    ``sort_within`` reproduces the secondary-sort contract — the pandas
    frame arrives ordered by those columns (sorted inside each group,
    cheap) so order-sensitive reducers (sessionization, first/last,
    deltas) behave like the reference's comparator-ordered iterator.
    """
    if sort_within:

        def ordered(pdf: pd.DataFrame) -> pd.DataFrame:
            return fn(pdf.sort_values(sort_within, kind="mergesort"))

        apply_fn = ordered
    else:
        apply_fn = fn
    return df.groupBy(*key_cols).applyInPandas(apply_fn, output_schema)


def tokenize_udtf():
    """Python UDTF (Spark ≥3.5 table function): the literal Mapper.map
    1→0..N surface (MRC/mapreduce/Mapper.java:122 — one input row, any
    number of context.write calls) as a first-class lateral table
    function. Row-at-a-time Python — the API-parity demo; the hot path
    for this exact computation is explode(split(...)) (see
    textstats.tokenize), which stays JVM-side.

    Returns the decorated class; register with
    ``spark.udtf.register("tokenize_udtf", tokenize_udtf())``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, token: string")
    class Tokenize:
        def eval(self, text: str):  # noqa: ANN001 - UDTF protocol
            if text is None:
                return
            pos = 0
            for tok in text.split(" "):
                if tok:
                    yield (pos, tok)
                    pos += 1

    return Tokenize
