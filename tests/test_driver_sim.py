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


def test_strict_norm_catches_representation_splits():
    """tools/verify_local --strict must distinguish the representation
    classes that broke r03 at the driver (Decimal(38,0) beyond float64's
    exact range vs its float64 collapse), while folding the tolerances
    driver-green rounds proved (NULL==NaN, DATE==midnight ts, integral
    float == int)."""
    import datetime
    import decimal
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "verify_local",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "verify_local.py"),
    )
    vl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vl)
    n = vl._norm_strict
    big = decimal.Decimal("57583116164155407018497697")  # > 2^53
    assert n(big) != n(float(big))  # the r03 teragen class: must differ
    assert n(decimal.Decimal("42")) == n(42) == n(42.0)  # small ints fold
    assert n(float("nan")) == n(None)  # pandas NULL->NaN folds
    assert n(datetime.datetime(2024, 1, 1)) == n(datetime.date(2024, 1, 1))
    assert n(datetime.datetime(2024, 1, 1, 0, 0, 1)) != n(datetime.date(2024, 1, 1))
    assert n(0.1) != n(decimal.Decimal("0.1"))  # fractional repr split
