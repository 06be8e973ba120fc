"""Writer facades (SURVEY.md §2.2): OutputFormat family as
``df.write`` constructions. Job commit (the FileOutputCommitter
`_temporary` rename protocol, lib/output/FileOutputCommitter.java:305)
is literally the same committer — Spark uses the Hadoop committers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_text_kv(df: DataFrame, path: str, key_col: str, value_col: str, sep: str = "\t") -> None:
    """TextOutputFormat: ``key<TAB>value`` lines, part-file layout."""
    df.select(
        F.concat_ws(sep, F.col(key_col).cast("string"), F.col(value_col).cast("string")).alias(
            "value"
        )
    ).write.mode("overwrite").text(path)


def write_parquet(df: DataFrame, path: str, compression: str = "snappy") -> None:
    """SequenceFileOutputFormat's role (compressed K/V container) →
    Parquet, the native columnar container."""
    df.write.mode("overwrite").option("compression", compression).parquet(path)


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    """ORC container sink — the other columnar K/V-container analog of
    SequenceFileOutputFormat (ref: lib/output/SequenceFileOutputFormat.java);
    same committer/part-file layout as parquet, different format."""
    df.write.mode("overwrite").option("compression", compression).orc(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """MultipleOutputFormat.generateFileNameForKeyValue (:144): output
    path derived from the record → ``partitionBy`` directory layout (also
    the scan-side partition-pruning enabler)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_multiple_outputs(
    df: DataFrame, routes: dict[str, tuple], base_path: str
) -> None:
    """MultipleOutputs (:69-73): several named outputs from one job.
    ``routes`` maps name → (filter_column_expr, format). The input is
    cached once; each named output is an independent action over the
    cached plan — the Spark translation of side outputs."""
    df.persist()
    try:
        for name, (predicate, fmt) in routes.items():
            out = df.filter(predicate)
            writer = out.write.mode("overwrite")
            if fmt == "parquet":
                writer.parquet(f"{base_path}/{name}")
            elif fmt == "json":
                writer.json(f"{base_path}/{name}")
            else:
                writer.csv(f"{base_path}/{name}", header=True)
    finally:
        df.unpersist()


def write_sorted_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, sort_col: str, num_buckets: int = 8
) -> None:
    """MapFileOutputFormat (sorted K/V + index for lookup,
    HC/io/MapFile.java:674 get/:692 getClosest): a sorted, bucketed table
    — point lookups prune to one bucket + pushed filter; joins on the
    bucket key skip the shuffle."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(sort_col)
        .saveAsTable(table_name)
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 1000,
    **options: str,
) -> None:
    """DBOutputFormat (MRC/mapreduce/lib/db/DBOutputFormat.java:237):
    INSERT each record into a JDBC table. Spark's JDBC sink is the same
    per-partition batched-INSERT protocol; ``batch_size`` maps to the
    reference's statement batching (executeBatch per chunk). One task per
    partition writes concurrently — same commit semantics (no global
    transaction) as the reference."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def mapfile_lookup(spark, table_name: str, key_col: str, key) -> DataFrame:
    """MapFile.get (HC/io/MapFile.java:674) /
    MapFileOutputFormat.getEntry (lib/output/MapFileOutputFormat.java:106):
    point lookup against a ``write_sorted_bucketed`` table. The equality
    predicate prunes to ONE bucket (the reference hashes the key to pick
    one part-file's reader) and pushes into the sorted scan — the plan's
    ``SelectedBucketsCount: 1 out of N`` is the exact analog of reading a
    single MapFile partition.

    Knob: Spark's planner only counts shuffle-elimination as a bucketing
    benefit, so set ``spark.sql.sources.bucketing.autoBucketedScan.enabled
    =false`` for lookup workloads to keep the bucket-pruned scan; with it
    on, the lookup still pushes the filter (row-group pruning) but reads
    every bucket's footer."""
    return spark.table(table_name).filter(F.col(key_col) == F.lit(key))


def mapfile_get_closest(
    spark, table_name: str, key_col: str, key, before: bool = False
) -> DataFrame:
    """MapFile.getClosest (HC/io/MapFile.java:692): the smallest key >=
    the requested one (or, with ``before``, the largest <= it). A pushed
    range filter + 1-row sorted head; row-group statistics prune the scan
    the way the MapFile index seeks the block."""
    t = spark.table(table_name)
    if before:
        return t.filter(F.col(key_col) <= F.lit(key)).orderBy(F.col(key_col).desc()).limit(1)
    return t.filter(F.col(key_col) >= F.lit(key)).orderBy(F.col(key_col).asc()).limit(1)


def write_noop(df: DataFrame) -> int:
    """NullOutputFormat: execute the plan, discard the rows (returns the
    row count as the observable side effect)."""
    return df.count()


def compact(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet directory into files of
    ~target size. The modern replacement for Hadoop Archives (HAR,
    TOOLS/hadoop-archives/.../HadoopArchives.java) — instead of wrapping
    small files in an index layer, rewrite them into properly-sized ones
    (readers already bin-pack small files per task; compaction fixes the
    listing/open cost permanently).

    Writes to ``out_path`` (never in place — the swap is the caller's
    atomic rename/catalog update). Returns the number of output files.
    File count = ceil(input_bytes / target); partition sizing uses the
    actual on-disk bytes from the file index, not a row-count guess.
    """
    import math

    df = spark.read.parquet(path)
    jvm_files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .selectExpr("sum(length) AS total")
        .first()
    )
    total = jvm_files.total or 0
    n = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n).write.mode("overwrite").parquet(out_path)
    return n


def write_sequence_file(
    df: DataFrame, path: str, key_col: str, value_col: str
) -> None:
    """SequenceFile WRITE bridge (SequenceFileOutputFormat,
    MRC/mapreduce/lib/output/SequenceFileOutputFormat.java) — the other
    half of readers.read_sequence_file, for pipelines that must hand
    results back to a legacy Hadoop consumer. Key/value stringified to
    Text writables (the reference's most common K/V shape); everything
    upstream stays a DataFrame and only the final sink drops to the RDD
    API."""
    (
        df.select(
            F.col(key_col).cast("string"), F.col(value_col).cast("string")
        )
        .rdd.map(tuple)
        .saveAsSequenceFile(path)
    )
