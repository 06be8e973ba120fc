"""Unit pins for the bench regression gate and the CPU yardstick
aggregation (pure functions in bench.py — no Spark session needed).

The gate is measurement infrastructure, but it is DRIVER-FACING: its
flags land verbatim in the archived BENCH_r{N}.json, and three rounds
of false flags (r8-r10) cost a manual BENCH_NOTES adjudication each.
These pins hold the two-component semantics (VERDICT r10 #1) the fix
established: a query flags only when it regressed under BOTH the
write yardstick AND the CPU yardstick, and every flag names which
component(s) fired so a degraded single-yardstick round is visible in
the artifact itself. Reference anchor: the SortValidator discipline
(JCT/mapred/SortValidator.java:54) — validate the measurement, not
just the output."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_gate_requires_both_components(bench):
    """The r10 phantom-flag class: the write yardstick says the host got
    2x faster (slow_write=0.5 would normalize a flat CPU-bound query to
    2x 'slower'); with the CPU yardstick flat, the max() denominator
    keeps the query unflagged."""
    cur, prev = {"q": 1.0}, {"q": 1.0}
    host = max(0.5, 1.0)  # max of the two available slowdowns
    out = bench._regressions(cur, prev, host, slow_write=0.5, slow_cpu=1.0)
    assert out == {}


def test_gate_fires_when_both_regress_and_names_components(bench):
    cur, prev = {"q": 2.0}, {"q": 1.0}
    out = bench._regressions(cur, prev, 1.0, slow_write=1.0, slow_cpu=1.0)
    rec = out["q"]
    assert rec["fired"] == "write+cpu"
    assert rec["ratio"] == 2.0
    assert rec["ratio_norm_write"] == 2.0 and rec["ratio_norm_cpu"] == 2.0


def test_gate_degraded_single_yardstick_is_labeled(bench):
    """A round where the CPU kernel tag changed (r10) or DFSIO failed
    gates on one component only — the flag must say so."""
    cur, prev = {"q": 2.0}, {"q": 1.0}
    out = bench._regressions(cur, prev, 1.0, slow_write=1.0, slow_cpu=None)
    assert out["q"]["fired"] == "write"
    out = bench._regressions(cur, prev, 1.0, slow_write=None, slow_cpu=1.0)
    assert out["q"]["fired"] == "cpu"
    out = bench._regressions(cur, prev, 1.0)
    assert out["q"]["fired"] == "combined"


def test_gate_skips_missing_and_errored_baselines(bench):
    """No baseline, zero baseline, or an errored (-1) current timing
    must never flag — the no-baseline newcomers go through the
    self-referential outlier retime instead."""
    out = bench._regressions(
        {"new_q": 50.0, "err_q": -1.0, "zero_prev": 1.0},
        {"err_q": 1.0, "zero_prev": 0.0},
        1.0,
    )
    assert out == {}


def test_gate_boundary_is_strictly_above_1_3(bench):
    out = bench._regressions({"q": 1.3}, {"q": 1.0}, 1.0)
    assert out == {}
    out = bench._regressions({"q": 1.31}, {"q": 1.0}, 1.0)
    assert "q" in out


def test_cpu_aggregate_even_count_uses_midpoint(bench):
    """ADVICE r10: the typical snapshot count is EVEN (initial + 3
    tier-end + final); sorted[n//2] latched the upper-middle value —
    a systematic slow bias on the yardstick. statistics.median takes
    the midpoint."""
    snaps = [
        {"cpu_mrows_s": 100.0, "cpu_reps": [1.0]},
        {"cpu_mrows_s": 140.0, "cpu_reps": [1.0]},
        {"cpu_mrows_s": 120.0, "cpu_reps": [1.0]},
        {"cpu_mrows_s": 160.0, "cpu_reps": [1.0]},
    ]
    agg = bench.cpu_aggregate(snaps)
    assert agg["cpu_mrows_s"] == 130.0  # (120+140)/2, not 140
    assert agg["cpu_snapshots"] == [100.0, 140.0, 120.0, 160.0]
    assert agg["cpu_rel_spread"] == 0.6
    assert bench.cpu_aggregate([]) == {}
