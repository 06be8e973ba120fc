"""Job-DAG orchestration — JobControl parity.

Reference: MRC/mapreduce/lib/jobcontrol/JobControl.java:57 +
ControlledJob.java — DAGs of dependent jobs, each materializing to HDFS
between stages. In Spark a multi-stage "DAG of jobs" is usually ONE lazy
plan (no intermediate materialization — the Grep two-job chain is a
single query here), so this helper exists for pipelines with genuine
side-effect boundaries (writes, external calls): topo-ordered execution
of named steps with explicit dependencies and shared state.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any


@dataclass
class ControlledStep:
    name: str
    fn: Callable[[dict[str, Any]], Any]
    depends_on: list[str] = field(default_factory=list)


class JobGraph:
    """Deterministic topological runner (JobControl.run's ready-set loop,
    minus threads: Spark actions already parallelize internally)."""

    def __init__(self) -> None:
        self._steps: dict[str, ControlledStep] = {}

    def add(self, name: str, fn: Callable[[dict[str, Any]], Any], depends_on: list[str] | None = None) -> "JobGraph":
        if name in self._steps:
            raise ValueError(f"duplicate step {name!r}")
        self._steps[name] = ControlledStep(name, fn, list(depends_on or []))
        return self

    def run(self) -> dict[str, Any]:
        """Execute steps in dependency order; each step receives the dict
        of prior results and its return value is recorded under its name."""
        ts = TopologicalSorter({s.name: s.depends_on for s in self._steps.values()})
        results: dict[str, Any] = {}
        for name in ts.static_order():
            results[name] = self._steps[name].fn(results)
        return results
