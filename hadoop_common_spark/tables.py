"""Test-data table loading (TESTDATA.md star schema + events/documents/embeddings)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Normalize events.ts to TimestampType (instant, session tz = UTC)
    # whatever the parquet physical form is across driver testdata
    # generations:
    #  - TIMESTAMP(NANOS) reads as a nanos long under
    #    spark.sql.legacy.parquet.nanosAsLong -> floor-div to micros
    #    (matching DuckDB's ns->us coercion);
    #  - TIMESTAMP(MICROS, isAdjustedToUTC=false) infers as
    #    TIMESTAMP_NTZ -> cast to instant (UTC session tz makes this the
    #    same wall-clock DuckDB sees). Downstream epoch math
    #    (CAST(ts AS LONG)) is ANSI-legal on TimestampType but NOT on
    #    NTZ, so the SQL surface must see one type everywhere.
    for field in df.schema.fields:
        if field.name == "ts":
            kind = field.dataType.simpleString()
            if kind == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif kind == "timestamp_ntz":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table as a DataFrame.

    Parquet scans get predicate pushdown + column pruning from Catalyst
    for free — the Spark replacement for the reference's hand-rolled
    ``PathFilter`` / split pruning (``lib/input/FileInputFormat.java:160``).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return {name: _read_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> dict[str, DataFrame]:
    """Load tables and register them as temp views for the SQL surface.

    The LOADS are memoized per (session, sf_dir): each costs ~10 parquet
    footer reads + py4j round trips (measured 0.6-2.0s), and the query
    wrappers call this on EVERY query — at small SFs that fixed overhead
    dominates sub-2s queries and its JVM-state variance was misread as
    per-query drift (r6's pipeline_clean_corpus watch item). The view
    REGISTRATION is re-applied every call (~85ms for all 10): a temp
    view is global per session, so anything that re-pointed one of the
    names out-of-band (a test registering its own 'documents') would
    otherwise silently survive a memo hit and serve wrong data. Pass
    ``force=True`` after rewriting a table's files at the same path
    in-session (a memoized DataFrame pins its file listing at read
    time)."""
    if force or getattr(spark, "_hcs_views_sf_dir", None) != sf_dir:
        spark._hcs_views_tables = load_tables(spark, sf_dir)
        spark._hcs_views_sf_dir = sf_dir
    tables = spark._hcs_views_tables
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
