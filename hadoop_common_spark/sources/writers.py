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
