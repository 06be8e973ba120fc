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


def test_banded_base_is_the_more_lenient_of_prev_and_median(bench):
    """VERDICT r11 #2: the r10→r11 false-flag class — r10 was a query's
    all-time-best round, so gating r11 on it alone flagged a
    reversion-to-band. The banded base is the LARGER of (prev, band
    median): a flag must mean slower than the whole recorded band, not
    just slower than the band's single fastest member."""
    hist = [
        ("BENCH_DETAIL_r11.json", {"q": 0.669, "slow": 3.0}),  # best-ever round
        ("BENCH_DETAIL_r10.json", {"q": 1.27, "slow": 1.0}),
        ("BENCH_DETAIL_r09.json", {"q": 1.32, "slow": 1.0}),
    ]
    prev = hist[0][1]
    base, notes = bench._banded(prev, hist)
    # best-ever prev (0.669) defers to the band median (1.27)
    assert base["q"] == 1.27 and "median" in notes["q"]
    # a prev that itself regressed (3.0, flagged last round) stays the
    # bar — staying at 3.0 is not a NEW regression, it was already
    # reported when it happened
    assert base["slow"] == 3.0 and "prev" in notes["slow"]


def test_banded_reversion_to_band_does_not_flag(bench):
    """The end-to-end shape of r11's three adjudicated flags AND the
    first r12 run's two: current value inside its historical band,
    prior round a freak best-ever. vs prev alone: 1.023/0.669 = 1.53
    -> flag; vs the banded base (median 1.27) it dissolves — exactly
    the judge's r11 hand-adjudication, now in the gate."""
    hist = [
        ("r11", {"q": 0.669}),  # freak best-ever
        ("r10", {"q": 1.27}),
        ("r09", {"q": 1.32}),
    ]
    base, notes = bench._banded(hist[0][1], hist)
    assert base["q"] == 1.27
    out = bench._regressions({"q": 1.023}, base, 1.0, 1.0, 1.0, base_notes=notes)
    assert out == {}
    # but a value slower than the WHOLE band still flags
    out = bench._regressions({"q": 1.8}, base, 1.0, 1.0, 1.0, base_notes=notes)
    assert out["q"]["base"].startswith("lenient(") and "median" in out["q"]["base"]


def test_regression_record_names_comparison_base(bench):
    base, notes = bench._banded(
        {"q": 1.0}, [("r11", {"q": 1.0}), ("r10", {"q": 1.1})]
    )
    out = bench._regressions({"q": 2.0}, base, 1.0, 1.0, 1.0, base_notes=notes)
    assert "base" in out["q"] and "prev" in out["q"]["base"]
    # without notes the record still says what it compared against
    out = bench._regressions({"q": 2.0}, {"q": 1.0}, 1.0, 1.0, 1.0)
    assert out["q"]["base"] == "prev"


def test_banded_query_missing_from_prev_uses_history_median(bench):
    """A query that errored in the newest archive (-1 / absent) but has
    older rounds keeps a gate base instead of silently losing it."""
    hist = [("r11", {}), ("r10", {"q": 2.0}), ("r09", {"q": 1.0})]
    base, notes = bench._banded(hist[0][1], hist)
    assert base["q"] == 1.5 and "no prev entry" in notes["q"]


def test_recent_round_baselines_orders_and_caps(bench, tmp_path, monkeypatch):
    import json as _json

    for n, qv in ((8, 4.0), (9, 3.0), (10, 2.0), (11, 1.0)):
        (tmp_path / f"BENCH_DETAIL_r{n:02d}.json").write_text(
            _json.dumps({"sf": 0.1, "queries": {"q": qv}})
        )
        (tmp_path / f"BENCH_r{n:02d}.json").write_text("{}")
    monkeypatch.setattr(bench, "REPO_DIR", str(tmp_path))
    hist = bench._recent_round_baselines(0.1, k=3)
    assert [lbl for lbl, *_ in hist] == [
        "BENCH_DETAIL_r11.json",
        "BENCH_DETAIL_r10.json",
        "BENCH_DETAIL_r09.json",
    ]
    assert hist[0][1] == {"q": 1.0}


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


def test_inline_queries_name_real_bench_rows(bench):
    """Every INLINE_QUERIES entry must name a query its tier actually
    times — a typo'd or stale name silently shrinks the per-query map
    the driver's PERF comparison and the reduced-core scaling sweep
    parse from the stdout line (VERDICT r12 #2/#5)."""
    tiers = {
        "": set(bench.HEADLINE) | {"terasort_equivalent"},
        "scale/": set(bench.SCALE_QUERIES),
        "scale100/": set(bench.SCALE100_QUERIES),
        "tpch/": set(bench.TPCH_SCALE_QUERIES),
    }
    bad = [(p, n) for p, n in bench.INLINE_QUERIES if n not in tiers[p]]
    assert not bad, f"INLINE_QUERIES entries not in their tier: {bad}"
    # deterministic across runs/core counts: no duplicates
    assert len(set(bench.INLINE_QUERIES)) == len(bench.INLINE_QUERIES)
