"""Synthetic data generators — the reference's generator examples rebuilt
as deterministic, shuffle-free `spark.range` pipelines.

Reference parity:
- TeraGen (EX/terasort/TeraGen.java:77): 100-byte records, 10-byte key /
  90-byte payload, plus a running checksum counter (:203-223) that
  TeraValidate compares against.
- RandomWriter / RandomTextWriter (EX/RandomWriter.java,
  RandomTextWriter.java): bulk synthetic K/V and text.
- QuasiMonteCarlo (EX/QuasiMonteCarlo.java:87,152-199): sample points,
  count in-circle, estimate pi.

Determinism: the reference seeds per-split Random/Halton state; we derive
every value from md5(row_id || tag) instead — identical output for any
partitioning, any engine (the DuckDB oracle replays the same formulas),
any re-run. Generation is a narrow map over `spark.range` — zero
shuffles, scales linearly with executors at any row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_common_spark.operators.dedup import hash60, hash60_sql


def _md5i(tagged: Column) -> Column:
    return hash60(tagged.cast("string"))


def teragen(spark: SparkSession, n_rows: int) -> DataFrame:
    """TeraGen: (key, payload) records — 10-hex-char key, 90-char payload.

    Key material comes from md5(i), payload from md5(i||'_p') repeated to
    90 chars (the reference fills with rotating alphabet; any
    deterministic filler serves the sort/validate workload).
    """
    return spark.range(n_rows).select(
        F.substring(F.md5(F.col("id").cast("string")), 1, 10).alias("key"),
        F.rpad(F.md5(F.concat(F.col("id").cast("string"), F.lit("_p"))), 90, "x").alias(
            "payload"
        ),
    )


TERAGEN_SQL = """
SELECT substr(md5(CAST(i AS VARCHAR)), 1, 10) AS key,
       rpad(md5(CAST(i AS VARCHAR) || '_p'), 90, 'x') AS payload
FROM generate_series(0, {max_i}) t(i)
"""


def teragen_checksum(df: DataFrame, key_col: str = "key", payload_col: str = "payload") -> DataFrame:
    """TeraValidate's checksum-sum (TeraGen.java:203-223 counter → compared
    by TeraValidate): order-independent sum of per-record hashes.
    Decimal(38,0) accumulator — no bigint overflow at petabyte row counts.

    The checksum is EMITTED as a zero-padded decimal string: a 5.8e22
    magnitude survives DECIMAL(38,0) on both engines but not every
    client's fetch path (pandas collapses DuckDB DECIMAL(38,0) to
    float64, which is exact only below 2^53). A fixed-width string is
    representation-proof end-to-end and stays order-independent."""
    rec_hash = hash60(F.concat(F.col(key_col), F.col(payload_col)))
    return df.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.lpad(
            F.sum(rec_hash.cast("decimal(38,0)")).cast("string"), 30, "0"
        ).alias("checksum"),
    )


def random_text(spark: SparkSession, n_rows: int, words_per_row: int = 10) -> DataFrame:
    """RandomTextWriter: rows of space-joined words drawn from a fixed
    vocabulary (the reference uses a 100-word list; ours is the synthetic
    vocabulary w000..w099) — word j of row i = w[md5(i||'_'||j) % 100]."""
    words = [
        F.concat(
            F.lit("w"),
            F.lpad((_md5i(F.concat(F.col("id").cast("string"), F.lit(f"_{j}"))) % 100).cast("string"), 3, "0"),
        )
        for j in range(words_per_row)
    ]
    return spark.range(n_rows).select(
        F.col("id").alias("row_id"), F.concat_ws(" ", *words).alias("text")
    )


def random_text_sql(n_rows: int, words_per_row: int = 10) -> str:
    terms = []
    for j in range(words_per_row):
        h = hash60_sql(f"CAST(i AS VARCHAR) || '_{j}'")
        terms.append(f"('w' || lpad(CAST({h} % 100 AS VARCHAR), 3, '0'))")
    words = " || ' ' || ".join(terms)
    return (
        f"SELECT i AS row_id, {words} AS text FROM generate_series(0, {n_rows - 1}) t(i)"
    )


def montecarlo_pi(spark: SparkSession, n_samples: int) -> DataFrame:
    """QuasiMonteCarlo: n deterministic pseudo-random points in the unit
    square; pi ~= 4 * inside / n. Coordinates are integers in [0, 1e6]
    (md5-derived) and the in-circle test is pure integer arithmetic —
    bit-exact across engines. One narrow map + one partial-aggregated
    count: the same shape as the reference's map-heavy + 1-reducer job."""
    scale = 1_000_000
    x = _md5i(F.concat(F.col("id").cast("string"), F.lit("_x"))) % (scale + 1)
    y = _md5i(F.concat(F.col("id").cast("string"), F.lit("_y"))) % (scale + 1)
    inside = (x * x + y * y <= F.lit(scale * scale)).cast("bigint")
    return spark.range(n_samples).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(inside).alias("n_inside"),
        # 4.0 (double) * bigint / bigint — double arithmetic throughout;
        # the oracle mirrors the exact operation order for bit-identity.
        (F.lit(4.0) * F.sum(inside) / F.count(F.lit(1))).alias("pi_estimate"),
    )


def montecarlo_pi_sql(n_samples: int) -> str:
    scale = 1_000_000
    hx = hash60_sql("CAST(i AS VARCHAR) || '_x'")
    hy = hash60_sql("CAST(i AS VARCHAR) || '_y'")
    x = f"({hx} % {scale + 1})"
    y = f"({hy} % {scale + 1})"
    inside = f"CAST(({x} * {x} + {y} * {y}) <= {scale * scale} AS BIGINT)"
    return f"""
    SELECT COUNT(*) AS n_samples,
           CAST(SUM({inside}) AS BIGINT) AS n_inside,
           CAST(4.0 AS DOUBLE) * CAST(SUM({inside}) AS BIGINT) / COUNT(*) AS pi_estimate
    FROM generate_series(0, {n_samples - 1}) t(i)
    """
