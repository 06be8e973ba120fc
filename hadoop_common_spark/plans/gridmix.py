"""Trace-driven synthetic load generation — Gridmix/Rumen parity.

Reference: TOOLS/hadoop-gridmix/.../gridmix/Gridmix.java (replay a Rumen
job trace as synthetic load) + TOOLS/hadoop-rumen (JobTraceReader's JSON
job objects). The reference's LOAD jobs regenerate each traced job's IO
profile (map input bytes -> shuffle -> reduce output); its submission
policies are SERIAL (one after another), REPLAY (respect traced
inter-arrival times, optionally time-scaled) and STRESS (submit as fast
as the cluster absorbs).

Spark-first shape: a traced job replays as generate(input_bytes) ->
repartition(maps) -> shuffle groupBy into `reduces` partitions -> count;
the generator is the deterministic md5 record synthesizer shared with
TeraGen (operators/synthgen.py), so replay is reproducible. Submission
concurrency uses a thread pool — Spark schedules concurrent jobs from
separate threads natively (FIFO/FAIR), which IS the Gridmix client
model.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REC_BYTES = 100  # TeraGen-style 100-byte records


def load_trace(spark: SparkSession, path: str) -> DataFrame:
    """Read a Rumen-style JSON job trace (one JSON object per job, as
    JobTraceReader emits) and normalize to the replay columns. Accepts
    the summary fields a full Rumen trace carries (jobID, submitTime,
    totalMaps, totalReduces, and byte counters when present); missing
    byte counts default from map counts (one HDFS block each)."""
    raw = spark.read.json(path)

    def col_or(name: str, default):
        return F.col(name) if name in raw.columns else F.lit(default)

    return raw.select(
        F.coalesce(col_or("jobID", None).cast("string"), F.monotonically_increasing_id().cast("string")).alias("job_id"),
        F.coalesce(col_or("submitTime", None).cast("long"), F.lit(0)).alias("submit_ms"),
        F.greatest(F.coalesce(col_or("totalMaps", None).cast("int"), F.lit(1)), F.lit(1)).alias("maps"),
        F.greatest(F.coalesce(col_or("totalReduces", None).cast("int"), F.lit(1)), F.lit(1)).alias("reduces"),
        F.coalesce(
            col_or("inputBytes", None).cast("long"),
            F.coalesce(col_or("totalMaps", None).cast("long"), F.lit(1)) * (128 << 20),
        ).alias("input_bytes"),
    ).orderBy("submit_ms")


def _load_job(spark: SparkSession, maps: int, reduces: int, n_rows: int) -> int:
    """One synthetic LOAD job: deterministic records across `maps`
    generator partitions, shuffled into `reduces` reduce partitions."""
    recs = (
        spark.range(n_rows, numPartitions=max(1, maps))
        .select(
            F.substring(F.md5(F.col("id").cast("string")), 1, 10).alias("key"),
            F.rpad(F.md5((F.col("id") + 1).cast("string")), _REC_BYTES - 10, "x").alias("payload"),
        )
    )
    reduced = (
        recs.repartition(max(1, reduces), "key")
        .groupBy(F.substring("key", 1, 2).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("payload").alias("mx"))
    )
    return reduced.agg(F.sum("n")).collect()[0][0] or 0


def replay(
    spark: SparkSession,
    trace: DataFrame,
    policy: str = "serial",
    time_scale: float = 0.0,
    byte_scale: float = 1.0,
    max_concurrency: int = 4,
) -> list[dict]:
    """Replay a normalized trace as synthetic load; returns one result
    dict per job (id, rows, seconds) in submission order.

    ``policy``: 'serial' runs jobs back to back; 'replay' submits at the
    traced inter-arrival times scaled by ``time_scale`` (0.0 = no waits,
    pure throughput replay); 'stress' submits everything at once, bounded
    by ``max_concurrency``. ``byte_scale`` shrinks/grows each job's IO
    profile (bench at 1e-6 of a production trace, grow to stress).

    The trace rows collected here are JOB METADATA (one row per traced
    job — Gridmix's own client holds the full trace in memory); the
    generated load itself never touches the driver."""
    if policy not in ("serial", "replay", "stress"):
        raise ValueError(f"unknown policy {policy!r}")
    jobs = trace.collect()
    results: list[dict] = []

    def run_one(row) -> dict:
        n_rows = max(1, int(row.input_bytes * byte_scale) // _REC_BYTES)
        t0 = time.time()
        n = _load_job(spark, row.maps, row.reduces, n_rows)
        return {"job_id": row.job_id, "rows": n, "seconds": round(time.time() - t0, 3)}

    if policy == "serial":
        for row in jobs:
            results.append(run_one(row))
        return results

    with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
        futs = []
        prev_ms = jobs[0].submit_ms if jobs else 0
        for row in jobs:
            if policy == "replay" and time_scale > 0:
                # inter-arrival DELTA from the previous job, not the
                # offset from trace start — sleeping the full offset each
                # iteration would prefix-sum the delays and distort the
                # traced schedule quadratically
                time.sleep(max(0.0, (row.submit_ms - prev_ms) * time_scale / 1000.0))
                prev_ms = row.submit_ms
            futs.append(pool.submit(run_one, row))
        for f in futs:
            results.append(f.result())
    return results
