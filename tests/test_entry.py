"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "revenue"}
    assert all(r.revenue > 0 for r in rows)


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 8
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_flagship_plan_broadcasts_dims(spark, sf_dir):
    qs = entrymod.queries()
    df = qs["flagship_revenue_by_nation"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_priority_lists_consistent():
    """Every PRIORITY name must exist in the registry (a typo would
    silently demote a query out of the checked window), no duplicates,
    and the hand-curated window block stays at <= 50 entries."""
    from hadoop_common_spark.queries import (
        PRIORITY,
        PRIORITY_WINDOW,
        load_all,
    )

    reg = load_all()
    missing = [n for n in PRIORITY if n not in reg]
    assert not missing, f"PRIORITY names not in registry: {missing}"
    assert len(set(PRIORITY)) == len(PRIORITY)
    assert len(PRIORITY_WINDOW) <= 50


def test_register_views_memoized_and_force(spark, tmp_path):
    """register_views is memoized per (session, sf_dir) — the per-query
    wrappers call it on EVERY query and the 10 footer reads were ~0.6s
    of fixed overhead inside every timed window (the r6 'drift').
    Switching sf_dir re-registers; force=True re-pins a view whose files
    were rewritten at the same path."""
    from pyspark.sql import functions as F

    from hadoop_common_spark.tables import register_views

    t1 = register_views(spark, "/root/testdata/sf0.001")
    t2 = register_views(spark, "/root/testdata/sf0.001")
    assert t2 is t1  # memo hit: same table dict, no re-read
    n_small = spark.table("lineitem").count()

    t3 = register_views(spark, "/root/testdata/sf0.01")
    assert t3 is not t1  # sf_dir switch re-registers
    assert spark.table("lineitem").count() > n_small

    # force=True re-pins after an in-place rewrite
    d = str(tmp_path / "sfX")
    import shutil

    shutil.copytree("/root/testdata/sf0.001", d)
    register_views(spark, d)
    assert spark.table("region").count() == 5
    spark.read.parquet(f"{d}/region.parquet").filter(F.col("r_regionkey") < 2).write.mode(
        "overwrite"
    ).parquet(f"{d}/region2.parquet")
    shutil.rmtree(f"{d}/region.parquet") if os.path.isdir(
        f"{d}/region.parquet"
    ) else os.unlink(f"{d}/region.parquet")
    shutil.move(f"{d}/region2.parquet", f"{d}/region.parquet")
    forced = register_views(spark, d, force=True)
    assert forced is not None
    assert spark.table("region").count() == 2
    # restore the standard views: the session is shared and a later test
    # reading spark.table(...) without its own register_views call must
    # not see this test's truncated tmp copy
    register_views(spark, "/root/testdata/sf0.001", force=True)
    assert spark.table("region").count() == 5
