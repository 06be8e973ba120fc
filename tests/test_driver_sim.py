"""Driver-contract gate, promoted into pytest (VERDICT r2 "Next round" #8).

The external harness imports __spark_entry__ with its OWN bare
SparkSession (non-UTC tz, default confs, non-repo cwd). tools/driver_sim.py
reproduces that hostile session; these tests run it in CI mode on a
5-query sample so testdata-regeneration breakage (the events.ts micros
incident, SURVEY §9.1) is caught by `pytest tests/` alone — plus a cheap
in-process schema assertion on register_views' type normalization.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CI_SAMPLE = [
    "flagship_revenue_by_nation",  # joins + date pushdown
    "window_tumbling_hourly",      # ts typing: breaks first if events.ts mis-types
    "events_multires_rollup",      # ts arithmetic via explode
    "corpus_quality_bins",         # global enumeration path
    "dedup_minhash_lsh",           # LLM-pipeline representative
]


def test_register_views_normalizes_column_types(spark, sf_dir):
    """events.ts must surface as an instant TimestampType whatever the
    parquet physical form is (nanos-long or TIMESTAMP_NTZ across driver
    testdata generations) — `CAST(ts AS LONG)` is an ANSI analysis error
    on NTZ, so one mis-typed column silently breaks the whole windows
    suite."""
    from pyspark.sql import types as T

    from hadoop_common_spark.tables import TABLE_NAMES, register_views

    tables = register_views(spark, sf_dir)
    assert set(tables) == set(TABLE_NAMES)
    ts_type = spark.table("events").schema["ts"].dataType
    assert isinstance(ts_type, T.TimestampType), ts_type  # instant, not NTZ
    # epoch math must be analyzable (the exact expression that broke)
    spark.sql("SELECT CAST(ts AS LONG) FROM events LIMIT 1").collect()
    # key-column spot checks: a re-typed join/agg column would shift
    # every oracle hash before any query visibly fails
    assert isinstance(spark.table("lineitem").schema["l_quantity"].dataType,
                      (T.DoubleType, T.DecimalType))
    assert isinstance(spark.table("orders").schema["o_orderkey"].dataType,
                      (T.LongType, T.IntegerType))
    assert isinstance(spark.table("embeddings").schema["embedding"].dataType,
                      T.ArrayType)
    assert isinstance(spark.table("documents").schema["text"].dataType,
                      T.StringType)


@pytest.mark.slow
def test_driver_sim_hostile_session_sample():
    """Run tools/driver_sim.py in a SUBPROCESS (a genuinely fresh,
    hostile, America/New_York session — an in-process fixture session
    can't be un-created) over the CI sample; nonzero exit = a query whose
    result differs from its DuckDB oracle under driver conditions."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", SPARK_GRAFT_DRIVER_MEM="4g")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_DIR, "tools", "driver_sim.py"), *CI_SAMPLE],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, f"driver_sim failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
