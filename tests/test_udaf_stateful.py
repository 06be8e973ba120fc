"""UDAF plugin registry, grouped pandas reduce, and stateful streaming."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hadoop_common_spark.operators.aggregate import AGGREGATORS, aggregate_job
from hadoop_common_spark.operators.udaf import (
    pandas_udaf,
    reduce_groups,
    register_aggregator,
)


def test_register_custom_pandas_udaf(spark):
    @pandas_udaf("double")
    def second_largest(v: pd.Series) -> float:
        s = v.sort_values(ascending=False)
        return float(s.iloc[1]) if len(s) > 1 else float("nan")

    if "SecondLargest" not in AGGREGATORS:
        register_aggregator("SecondLargest", lambda c: second_largest(c))

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("a", 3.0), ("b", 2.0)], ["k", "v"]
    )
    got = {
        r.k: r.out
        for r in aggregate_job(df, ["k"], [("out", "SecondLargest", "v")]).collect()
    }
    assert got["a"] == 3.0
    # Arrow surfaces the NaN as SQL NULL (or NaN, version-dependent)
    assert got["b"] is None or got["b"] != got["b"]


def test_register_duplicate_rejected(spark):
    with pytest.raises(ValueError):
        register_aggregator("LongValueSum", lambda c: F.sum(c))


def test_reduce_groups_secondary_sort(spark):
    """The Reducer.reduce surface with the secondary-sort contract:
    values arrive ordered within the group (SecondarySort.java analog —
    emit per-key deltas between consecutive ordered values)."""
    df = spark.createDataFrame(
        [(1, 30), (1, 10), (1, 20), (2, 5), (2, 50)], ["k", "v"]
    )

    def deltas(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["v"].tolist()
        return pd.DataFrame(
            {"k": pdf["k"].iloc[0], "delta": [b - a for a, b in zip(v, v[1:])]}
        )

    got = reduce_groups(df, ["k"], deltas, "k LONG, delta LONG", sort_within=["v"])
    rows = sorted((r.k, r.delta) for r in got.collect())
    assert rows == [(1, 10), (1, 10), (2, 45)]


def test_stateful_running_totals(spark, sf_dir):
    from hadoop_common_spark.streaming.jobs import read_events_stream
    from hadoop_common_spark.streaming.stateful import running_user_totals

    stream = read_events_stream(spark, sf_dir)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.user_id: (r.n_events, r.value_sum) for r in spark.table("t_stateful").collect()}

    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    want = {r.user_id: (r.n, r.s) for r in batch.collect()}
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0]
        assert abs(got[uid][1] - want[uid][1]) < 1e-6


def test_tokenize_udtf_lateral_join(spark):
    """UDTF = Mapper's 1→N contract as a lateral table function; result
    must equal the JVM-side posexplode(split(...)) hot path."""
    from hadoop_common_spark.operators.udaf import tokenize_udtf

    spark.udtf.register("tok_udtf", tokenize_udtf())
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "x  y"), (2, None)], ["doc_id", "text"]
    )
    df.createOrReplaceTempView("_tok_docs")
    got = spark.sql(
        "SELECT doc_id, pos, token FROM _tok_docs, LATERAL tok_udtf(text)"
    )
    rows = {(r.doc_id, r.pos, r.token) for r in got.collect()}
    assert rows == {(0, 0, "a"), (0, 1, "b"), (0, 2, "c"), (1, 0, "x"), (1, 1, "y")}
