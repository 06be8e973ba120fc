"""Generators, counters, bad-record skipping, and sort-validation tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_common_spark.functions.counters import with_counters
from hadoop_common_spark.operators.synthgen import montecarlo_pi, random_text, teragen
from hadoop_common_spark.sources.readers import read_csv_skip_bad


def test_teragen_deterministic_across_partitionings(spark):
    a = teragen(spark, 1000).collect()
    b = teragen(spark, 1000).repartition(13).collect()
    assert sorted(a) == sorted(b)
    row = a[0]
    assert len(row.key) == 10 and len(row.payload) == 90


def test_terasort_global_order(spark):
    """TeraValidate's core assertion: records are globally ordered across
    output partitions after a range-partitioned sort."""
    out = teragen(spark, 5000).repartitionByRange(8, "key").sortWithinPartitions("key")
    per_part = out.select(
        F.spark_partition_id().alias("pid"), "key"
    ).groupBy("pid").agg(F.min("key").alias("lo"), F.max("key").alias("hi"))
    parts = sorted(per_part.collect(), key=lambda r: r.lo)
    for prev, cur in zip(parts, parts[1:]):
        assert prev.hi <= cur.lo  # partition ranges must not overlap
    # and within partitions the data is sorted
    unsorted = (
        out.select(F.spark_partition_id().alias("pid"), "key")
        .withColumn(
            "prev",
            F.lag("key").over(
                Window.partitionBy("pid").orderBy(F.monotonically_increasing_id())
            ),
        )
        .filter(F.col("prev") > F.col("key"))
        .count()
    )
    assert unsorted == 0


def test_montecarlo_pi_close(spark):
    row = montecarlo_pi(spark, 50_000).collect()[0]
    assert row.n_samples == 50_000
    assert math.isclose(row.pi_estimate, math.pi, rel_tol=0.02)


def test_random_text_vocab(spark):
    words = (
        random_text(spark, 500)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .select("w").distinct().collect()
    )
    assert 50 <= len(words) <= 100
    assert all(r.w.startswith("w") and len(r.w) == 4 for r in words)


def test_counters_observe(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    counted, obs = with_counters(
        df, input_records=F.count(F.lit(1)), sum_v=F.sum("v")
    )
    counted.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["input_records"] == 100
    assert got["sum_v"] == 9900


def test_read_csv_skip_bad(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("1,alpha\n2,beta\nnot_an_int,gamma\n3,delta\n")
    # cache() before referencing the corrupt column alone — Spark refuses
    # corrupt-record-only queries on the raw scan (see reader docstring)
    df = read_csv_skip_bad(spark, str(p), "id INT, name STRING").cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 3
    assert bad.count() == 1
    assert bad.collect()[0]._corrupt_record.startswith("not_an_int")


def test_gridmix_trace_replay(spark, tmp_path):
    """Gridmix/Rumen shape: a 3-job Rumen-style trace replays as
    deterministic synthetic load jobs — serial order preserved, per-job
    IO profile honored (rows = input_bytes * byte_scale / 100), and the
    stress policy completes every job concurrently."""
    import json as _json

    from hadoop_common_spark.plans.gridmix import load_trace, replay

    trace_file = tmp_path / "trace.json"
    jobs = [
        {"jobID": "job_1", "submitTime": 1000, "totalMaps": 2, "totalReduces": 2,
         "inputBytes": 200_000},
        {"jobID": "job_2", "submitTime": 2000, "totalMaps": 1, "totalReduces": 1,
         "inputBytes": 50_000},
        {"jobID": "job_3", "submitTime": 3000},  # sparse record: defaults
    ]
    trace_file.write_text("\n".join(_json.dumps(j) for j in jobs))

    trace = load_trace(spark, str(trace_file))
    rows = trace.collect()
    assert [r.job_id for r in rows] == ["job_1", "job_2", "job_3"]
    assert rows[0].maps == 2 and rows[0].reduces == 2
    assert rows[2].maps == 1 and rows[2].input_bytes == 128 << 20

    got = replay(spark, trace, policy="serial", byte_scale=1e-3)
    assert [g["job_id"] for g in got] == ["job_1", "job_2", "job_3"]
    # LOAD profile: job_1 = 200_000 * 1e-3 / 100 = 2 records, job_3
    # defaults to one 128MB block -> 1342 records
    assert got[0]["rows"] == 2
    assert got[2]["rows"] == (128 << 20) // 1000 // 100

    stress = replay(spark, trace, policy="stress", byte_scale=1e-3, max_concurrency=3)
    assert sorted(g["job_id"] for g in stress) == ["job_1", "job_2", "job_3"]
    assert all(g["rows"] >= 1 for g in stress)
