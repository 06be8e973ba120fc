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


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register them as temp views for the SQL surface."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
