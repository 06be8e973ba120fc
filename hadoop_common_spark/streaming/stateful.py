"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming at all (SURVEY.md §2.10); this is the
superset surface for operators the built-in windowed aggregations can't
express — per-key state machines, custom eviction, running aggregates
emitted per batch.

Scale notes: state lives in the state store partitioned by the grouping
key (RocksDB-backed on a real cluster); a watermark-driven timeout bounds
state size. Each micro-batch ships only that batch's rows per key to
Python as Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event_count, value_sum) emitted every batch —
    a custom stateful operator: state = two numbers per user, updated per
    micro-batch, no window/watermark needed (unbounded keys would need a
    timeout policy; user_id cardinality is bounded here)."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "value_sum": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id BIGINT, n_events BIGINT, value_sum DOUBLE",
            stateStructType="n BIGINT, total DOUBLE",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
