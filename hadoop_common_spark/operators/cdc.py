"""Change-data-capture merge: apply a batch of keyed insert/update/
delete operations onto a snapshot (the lakehouse MERGE INTO / upsert
primitive).

Reference analog: the closest Hadoop idiom is the reduce-side "latest
record wins" compaction MapReduce jobs ran over append-only logs
(secondary sort on (key, seq), keep the last) — e.g. the sort+reduce
pattern of hadoop-mapreduce-examples' SecondarySort
(`hadoop-mapreduce-project/hadoop-mapreduce-examples/src/main/java/org/
apache/hadoop/examples/SecondarySort.java:1`) applied to mutation logs.
Spark-first rendering: the per-key "latest op" is ONE struct-max
aggregate (max over (seq..., op, payload) — partial-aggregated, no
window sort, no secondary-sort machinery), and the apply step is one
full-outer join of snapshot and deduped batch.

Determinism: the seq columns must totally order ops within a key
(callers pass a tiebreaker, e.g. (ts, event_id)); struct-max then picks
a unique winner, so re-runs and retries are idempotent — redelivering a
CDC batch is a no-op, which is the exactly-once story downstream sinks
rely on.

Scale: both sides shuffle once on the key (AQE handles skewed hot keys);
the batch side is typically tiny vs the snapshot, so Spark broadcasts
it — the snapshot is NEVER rewritten more than once per merge, which is
the whole point vs re-materializing the log.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["latest_ops", "cdc_merge", "materialize_log"]


def _winner(seq_cols: Sequence[str], op_col: str, payload_cols: Sequence[str]) -> Column:
    """struct-max over (seq..., op, payload...): the latest op per key,
    chosen by the total order of seq_cols — one partial-aggregated
    reduce, the relational form of secondary-sort-keep-last."""
    fields = [F.col(c).alias(c) for c in (*seq_cols, op_col, *payload_cols)]
    return F.max(F.struct(*fields)).alias("_w")


def latest_ops(
    log: DataFrame,
    key: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse an op log to its final op per key: (key, op, payload,
    seq...). Ops must be 'I'/'U'/'D'; seq_cols must totally order ops
    within a key."""
    w = log.groupBy(key).agg(_winner(seq_cols, op_col, payload_cols))
    cols = [F.col(key)] + [
        F.col(f"_w.{c}").alias(c) for c in (*seq_cols, op_col, *payload_cols)
    ]
    return w.select(*cols)


def cdc_merge(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """MERGE the final op per key from ``changes`` into ``snapshot``:
    'D' removes the key, 'I'/'U' upsert the payload, untouched snapshot
    rows pass through. Snapshot must carry (key, payload..., seq...).
    Returns the new snapshot with the same columns."""
    latest = latest_ops(changes, key, seq_cols, op_col, payload_cols)
    ch = latest.select(
        F.col(key),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_n_{c}") for c in (*seq_cols, *payload_cols)],
    )
    merged = snapshot.join(ch, key, "full_outer")
    keep = F.col("_op").isNull() | (F.col("_op") != F.lit("D"))
    # the batch side wins whenever it HAS an op for the key — decided by
    # the op marker, never by payload nullness: an update that sets a
    # column to NULL must write that NULL (coalesce would silently keep
    # the stale snapshot value and break fold-equivalence)
    batch_has_op = F.col("_op").isNotNull()
    out_cols = [F.col(key)] + [
        F.when(batch_has_op, F.col(f"_n_{c}")).otherwise(F.col(c)).alias(c)
        for c in (*seq_cols, *payload_cols)
    ]
    return merged.filter(keep).select(*out_cols)


def materialize_log(
    log: DataFrame,
    key: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold the WHOLE log into a snapshot: latest op per key, deletes
    dropped. cdc_merge(materialize_log(prefix), suffix) must equal
    materialize_log(prefix + suffix) — the fold-equivalence contract
    (pinned in tests) that makes incremental maintenance safe."""
    latest = latest_ops(log, key, seq_cols, op_col, payload_cols)
    return latest.filter(F.col(op_col) != F.lit("D")).drop(op_col)
