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


def protobuf_bridge_dir() -> str:
    """Path of the repo's google.protobuf bridge package (see its
    docstring): a sys.path entry that serves the Cloud SDK's vendored
    pure-Python protobuf runtime as ``google.protobuf`` on runtimes
    without the wheel."""
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "third_party",
        "protobuf_bridge",
    )


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable in THIS process and in every
    Python worker Spark will spawn, or report False.

    Order: a real protobuf wheel wins (the bridge is never put on the
    path when one exists, so it cannot shadow a genuine install); else
    the bridge package is added to sys.path (driver side) and to the
    PYTHONPATH environment variable — worker processes (task workers and
    the TWS driver worker) are launched by the JVM with the environment
    the JVM inherited from this process, so this must run BEFORE the
    first SparkSession is built to cover them (session.get_spark does).
    """
    import os
    import sys

    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    bridge = protobuf_bridge_dir()
    if bridge not in sys.path:
        sys.path.insert(0, bridge)
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        sys.path.remove(bridge)
        return False
    existing = os.environ.get("PYTHONPATH", "")
    if bridge not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            bridge + os.pathsep + existing if existing else bridge
        )
    return True


def transform_with_state_available() -> bool:
    """transformWithState needs google.protobuf in every Python process
    of the query (the driver-side state-schema worker and the task
    workers import StateMessage_pb2); a runtime without it crashes the
    query at schema validation. Probe (and, where possible, provision
    via the bridge) so callers and tests can fall back to
    applyInPandasWithState instead of failing mid-stream."""
    return ensure_protobuf()


def distinct_event_types_tws(events: DataFrame) -> DataFrame:
    """Per-user DISTINCT event-type count as a transformWithState
    operator (the Spark 4.x arbitrary-state API, successor to
    applyInPandasWithState): state is one MapState keyed by event type —
    the state store holds each (user, type) entry once, so an update
    touches only the arriving keys instead of rewriting a whole
    serialized set per batch (the applyInPandasWithState pattern above
    must round-trip its entire state value every time). Emits the
    running distinct count per user each batch; with an availableNow
    drain over a static source this equals the batch
    count_distinct(event_type) — pinned in pytest (skipped where the
    runtime lacks protobuf — see transform_with_state_available; the
    applyInPandasWithState twin below is the no-protobuf fallback).

    Scale: state is partitioned by user in the state store (RocksDB on a
    cluster); per-batch work is Arrow-shipped rows for the touched keys
    only. Unbounded type cardinality would call for a TTL
    (getMapState(ttlDurationMs=...)); event_type is a bounded enum here.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class DistinctTypes(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getMapState("seen", "t string", "one tinyint")

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for t in pdf["event_type"].dropna().unique():
                    self._seen.updateValue((str(t),), (1,))
            n = sum(1 for _ in self._seen.keys())
            yield pd.DataFrame({"user_id": [key[0]], "n_types": [n]})

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            DistinctTypes(),
            outputStructType="user_id BIGINT, n_types BIGINT",
            outputMode="update",
            timeMode="none",
        )
    )


def session_expiry_tws(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "10 seconds",
    initial_state: DataFrame | None = None,
) -> DataFrame:
    """Timer-driven session expiry on transformWithState (ValueState +
    event-time timers): per-user sessions split by >gap_sec silence;
    a session is emitted exactly once, WHEN IT EXPIRES — the watermark
    passes last_event + gap and the registered timer fires — not on
    every touch. This is the operator shape the windowed built-ins
    can't express (session_window emits per-window aggregates downstream
    of a watermark, but can't run arbitrary per-key logic at expiry:
    cleanup, side outputs, tiered state demotion).

    Batch twin (the oracle-checked contract):
    queries/windows.py::stream_session_expiry_batch — after a drain in
    which the watermark advances past every session (the test appends
    two far-future flush batches; see the drain≡batch pin), the emitted
    set equals full batch gaps-and-islands sessionization.

    Scale: state = 3 longs per OPEN session per user, partitioned by
    user in the state store; timers are the state store's own timer
    column family. Closed sessions leave state immediately — the
    watermark bounds total state regardless of stream length.

    Intra-batch gaps close sessions inline (no timer round-trip); only
    the tail session per user waits for its timer. LATE events (older
    than the watermark): the eventTime column is projected away before
    the groupBy, so Spark does not drop them — a late event arriving
    while its session is still OPEN merges into it (pinned in
    test_tws_session_expiry_late_event_merges); one arriving after the
    session expired starts a fresh session rather than resurrecting the
    emitted one. Both are the operationally-useful readings of a session
    gap; a strict-dropping variant would keep ``ts`` through the groupBy
    and let the watermark filter act.

    ``initial_state`` (optional) BOOTSTRAPS the maintainer with the OPEN
    sessions of a previous run — (user_id, session_start, session_end,
    n_events) rows in epoch seconds — via handleInitialState, which must
    also RE-ARM each seeded session's expiry timer (a restarted job's
    state without its timers would hold open sessions forever). Restart
    == full recompute minus the sessions the previous run already
    emitted — pinned in test_tws_session_expiry_initial_state_bootstrap.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_ms = gap_sec * 1000

    class Sessions(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._h = handle
            self._sess = handle.getValueState(
                "sess", "start long, last long, n long"
            )

        def handleInitialState(self, key, initialState, timerValues) -> None:
            # one open session per key from the previous run's state —
            # store it AND re-arm its expiry timer (seeded state without
            # its timer would hold the session open forever)
            start = int(initialState["session_start"].iloc[0])
            last = int(initialState["session_end"].iloc[0])
            n = int(initialState["n_events"].iloc[0])
            self._sess.update((start, last, n))
            self._h.registerTimer(last * 1000 + gap_ms)

        def handleInputRows(self, key, rows, timerValues):
            es: list[int] = []
            for pdf in rows:
                es.extend(int(x) for x in pdf["e"].dropna())
            es.sort()
            if self._sess.exists():
                st = self._sess.get()
                start, last, n = int(st[0]), int(st[1]), int(st[2])
                # the live session's pending timer is superseded below
                self._h.deleteTimer(last * 1000 + gap_ms)
            else:
                start = last = -1
                n = 0
            closed: list[tuple[int, int, int]] = []
            for e in es:
                if n == 0:
                    start, last, n = e, e, 1
                elif e - last > gap_sec:
                    closed.append((start, last, n))
                    start, last, n = e, e, 1
                else:
                    last, n = max(last, e), n + 1
            self._sess.update((start, last, n))
            self._h.registerTimer(last * 1000 + gap_ms)
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(closed),
                        "session_start": [c[0] for c in closed],
                        "session_end": [c[1] for c in closed],
                        "n_events": [c[2] for c in closed],
                    }
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._sess.exists():
                return
            st = self._sess.get()
            start, last, n = int(st[0]), int(st[1]), int(st[2])
            # stale-timer guard: only the LIVE session's timer closes it
            # (a superseded timer that slipped deletion must be a no-op)
            if expiredTimerInfo.getExpiryTimeInMs() < last * 1000 + gap_ms:
                return
            self._sess.clear()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .selectExpr("user_id", "CAST(ts AS LONG) AS e")
        .groupBy("user_id")
        .transformWithStateInPandas(
            Sessions(),
            outputStructType=(
                "user_id BIGINT, session_start BIGINT, "
                "session_end BIGINT, n_events BIGINT"
            ),
            outputMode="append",
            timeMode="eventTime",
            **(
                {
                    "initialState": initial_state.select(
                        "user_id", "session_start", "session_end", "n_events"
                    ).groupBy("user_id")
                }
                if initial_state is not None
                else {}
            ),
        )
    )


def topk_events_tws(
    events: DataFrame, k: int = 3, initial_state: DataFrame | None = None
) -> DataFrame:
    """Per-user bounded top-k maintainer on transformWithState
    (ListState): state is AT MOST k (value, event_id) rows per user —
    merge the batch's arrivals with the stored k, keep the best k by
    (value desc, event_id asc), emit the refreshed ranking. The LAST
    emission per user after a drain equals the batch top-k — pinned
    against queries/windows.py::stream_topk_per_user_batch (the
    oracle-backed twin).

    ``initial_state`` (optional) BOOTSTRAPS the maintainer from a batch
    snapshot — (user_id, event_id, value) rows, e.g. yesterday's
    materialized top-k — via the handleInitialState hook (first batch
    only). Bootstrap + incremental drain over only-the-new events
    equals a full batch recompute for every touched user — the
    production restart pattern, pinned in
    test_tws_topk_initial_state_bootstrap.

    This is the streaming form of grouped top-k (SURVEY §2.6): the
    batch two-phase salted version bounds a hot group's shuffle; here
    the ListState bounds its STATE — an unbounded-stream property no
    windowed aggregate provides (collect_list state grows with the
    stream; this never exceeds k rows per user)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._top = handle.getListState("top", "value double, event_id long")

        def _merge_and_emit(self, key, incoming):
            cur = [(float(r[0]), int(r[1])) for r in self._top.get()]
            cur.extend(incoming)
            cur.sort(key=lambda t: (-t[0], t[1]))
            del cur[k:]
            self._top.put(cur)
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(cur),
                    "event_id": [e for _, e in cur],
                    "value": [v for v, _ in cur],
                    "rnk": list(range(1, len(cur) + 1)),
                }
            )

        def handleInitialState(self, key, initialState, timerValues) -> None:
            # seed rows for this key (first batch only); no emission —
            # the seed is yesterday's already-materialized answer
            self._merge_and_emit(
                key,
                [
                    (float(v), int(e))
                    for v, e in zip(
                        initialState["value"], initialState["event_id"]
                    )
                ],
            )

        def handleInputRows(self, key, rows, timerValues):
            inc: list[tuple[float, int]] = []
            for pdf in rows:
                inc.extend(
                    (float(v), int(e))
                    for v, e in zip(pdf["value"], pdf["event_id"])
                )
            yield self._merge_and_emit(key, inc)

        def close(self) -> None:
            pass

    kwargs = {}
    if initial_state is not None:
        kwargs["initialState"] = initial_state.select(
            "user_id", "event_id", "value"
        ).groupBy("user_id")
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TopK(),
            outputStructType=(
                "user_id BIGINT, event_id BIGINT, value DOUBLE, rnk BIGINT"
            ),
            outputMode="update",
            timeMode="none",
            **kwargs,
        )
    )


def session_expiry_state(
    events: DataFrame, gap_sec: int = 1800, watermark: str = "10 seconds"
) -> DataFrame:
    """No-protobuf twin of :func:`session_expiry_tws` on the
    applyInPandasWithState API: GroupStateTimeout.EventTimeTimeout plays
    the timer role — ``state.setTimeoutTimestamp(last + gap)`` arms it,
    and when the watermark passes it, the update function is re-invoked
    with ``state.hasTimedOut`` and no rows, which emits the session and
    clears state. Identical output contract: one (user_id,
    session_start, session_end, n_events) row per session, emitted at
    expiry. The round-trip cost difference vs TWS is negligible here
    (state is 3 longs either way); the TWS form exists for the richer
    state/timer surface, this form for runtimes without protobuf."""
    gap_ms = gap_sec * 1000

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [int(start)],
                    "session_end": [int(last)],
                    "n_events": [int(n)],
                }
            )
            return
        es: list[int] = []
        for pdf in pdfs:
            es.extend(int(x) for x in pdf["e"].dropna())
        es.sort()
        if state.exists:
            start, last, n = (int(v) for v in state.get)
        else:
            start = last = -1
            n = 0
        closed: list[tuple[int, int, int]] = []
        for e in es:
            if n == 0:
                start, last, n = e, e, 1
            elif e - last > gap_sec:
                closed.append((start, last, n))
                start, last, n = e, e, 1
            else:
                last, n = max(last, e), n + 1
        state.update((start, last, n))
        state.setTimeoutTimestamp(last * 1000 + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        # the watermarked ts column must SURVIVE into the stateful
        # operator (EventTimeTimeout is rejected at analysis otherwise);
        # the update fn reads only the epoch-second projection `e`
        .selectExpr("user_id", "ts", "CAST(ts AS LONG) AS e")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id BIGINT, session_start BIGINT, "
                "session_end BIGINT, n_events BIGINT"
            ),
            stateStructType="start long, last long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def topk_events_state(events: DataFrame, k: int = 3) -> DataFrame:
    """No-protobuf twin of :func:`topk_events_tws` on the
    applyInPandasWithState API: state = the two parallel top-k arrays
    per user (round-tripped whole each batch — at k rows per key that
    round trip is the whole point of the bound). Identical output
    contract: the refreshed (user_id, event_id, value, rnk) ranking per
    touched user per batch."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cur: list[tuple[float, int]] = (
            [(float(v), int(e)) for v, e in zip(*state.get)]
            if state.exists
            else []
        )
        for pdf in pdfs:
            cur.extend(
                (float(v), int(e))
                for v, e in zip(pdf["value"], pdf["event_id"])
            )
        cur.sort(key=lambda t: (-t[0], t[1]))
        del cur[k:]
        state.update(([v for v, _ in cur], [e for _, e in cur]))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(cur),
                "event_id": [e for _, e in cur],
                "value": [v for v, _ in cur],
                "rnk": list(range(1, len(cur) + 1)),
            }
        )

    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id BIGINT, event_id BIGINT, value DOUBLE, rnk BIGINT"
            ),
            stateStructType="vals array<double>, ids array<bigint>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ewma_state(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Streaming face of the registry's oracle-backed
    ``events_user_ewma``: per-user EWMA of ``value`` in (ts, event_id)
    order as an applyInPandasWithState maintainer — state is TWO
    numbers per user (current ewma, count) however long the stream
    runs, vs the batch form's collected per-key history array (whose
    hot-key cost the skew fixture measures at 115.7s/9M rows — the
    streaming maintainer never materializes history at all).

    The per-batch fold applies the recurrence in (e, event_id) order —
    bit-identical to the batch form when batches arrive in event-time
    order per key (an availableNow drain of a time-partitioned source;
    pinned exactly in test_state_ewma_matches_batch). Out-of-order
    ACROSS batches folds in arrival order — the standard streaming
    approximation; use the batch form for reproducible backfills."""
    beta = 1.0 - alpha

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows: list[tuple[int, int, float]] = []
        for pdf in pdfs:
            rows.extend(
                (int(e), int(i), float(v))
                for e, i, v in zip(pdf["e"], pdf["event_id"], pdf["value"])
            )
        rows.sort()
        if state.exists:
            y, n = state.get
            n = int(n)
        else:
            y, n = None, 0
        for _, _, v in rows:
            y = v if y is None else y * beta + v * alpha
            n += 1
        state.update((float(y), n))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "ewma_value": [y]}
        )

    return (
        events.selectExpr("user_id", "CAST(ts AS LONG) AS e", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id BIGINT, n_events BIGINT, ewma_value DOUBLE",
            stateStructType="y double, n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def distinct_event_types_state(events: DataFrame) -> DataFrame:
    """No-protobuf twin of :func:`distinct_event_types_tws` on the
    applyInPandasWithState API: state = the sorted distinct-type array
    per user (round-tripped whole each batch — the serialization cost
    the MapState form avoids; acceptable for a bounded enum). Identical
    output contract: (user_id, n_types) per touched user per batch."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            seen.update(str(t) for t in pdf["event_type"].dropna().unique())
        state.update((sorted(seen),))
        yield pd.DataFrame({"user_id": [user_id], "n_types": [len(seen)]})

    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id BIGINT, n_types BIGINT",
            stateStructType="seen array<string>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
