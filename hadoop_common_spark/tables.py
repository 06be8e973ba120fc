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
    # Parquet TIMESTAMP(NANOS) (events.ts) is read as a nanos long under
    # spark.sql.legacy.parquet.nanosAsLong; normalize to a micros timestamp
    # (floor-div, matching DuckDB's ns→us coercion) so the SQL surface sees
    # TimestampType everywhere.
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
