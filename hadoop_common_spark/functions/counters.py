"""Job counters — the reference's global metric surface rebuilt on
``df.observe``.

Reference: MRC/mapreduce/Counters.java, TaskCounter.java:28-47
(MAP_INPUT_RECORDS, MAP_OUTPUT_RECORDS, SPILLED_RECORDS, ...): every job
accumulates named long counters merged at the AM, readable after
completion. Spark's ``Observation`` is the declarative equivalent —
metrics are computed inside the existing plan (no extra pass, merged
exactly once per row even under task retries, unlike raw accumulators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_counters(
    df: DataFrame, name: str = "counters", **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named counters to a DataFrame; values are available from the
    returned Observation after the first action.

        counted, obs = with_counters(df, input_records=F.count(F.lit(1)))
        counted.write...   # any action
        obs.get["input_records"]
    """
    obs = Observation(name)
    cols = [expr.alias(key) for key, expr in metrics.items()]
    return df.observe(obs, *cols), obs


def record_counters(df: DataFrame, name: str = "records") -> tuple[DataFrame, Observation]:
    """The TaskCounter basics: record count + null-free count per run."""
    no_null = None
    for c in df.columns:
        cond = F.col("`" + c.replace("`", "``") + "`").isNotNull()
        no_null = cond if no_null is None else (no_null & cond)
    return with_counters(
        df,
        name,
        input_records=F.count(F.lit(1)),
        null_free_records=F.count(F.when(no_null if no_null is not None else F.lit(True), 1)),
    )
