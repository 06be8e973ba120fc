"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

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
