"""Reader facades: every InputFormat family from SURVEY.md §2.1 as a
``spark.read`` construction (Catalyst owns splits, pruning, pushdown).

| Reference InputFormat | Here |
|---|---|
| FileInputFormat split math (getSplits :334)      | spark.sql.files.maxPartitionBytes |
| PathFilter / globs (:160)                        | pathGlobFilter option |
| TextInputFormat / LineRecordReader               | read_text |
| KeyValueTextInputFormat (:63)                    | read_kv_text |
| NLineInputFormat (fan-out control)               | read_text + repartition |
| FixedLengthInputFormat (:50)                     | read_fixed_width |
| SequenceFile* (K/V containers)                   | Parquet (native container) |
| CombineFileInputFormat (small-file packing)      | files.openCostInBytes (automatic) |
| MultipleInputs / DelegatingMapper                | read_multi (per-source transform + unionByName) |
| DBInputFormat / DataDrivenDBInputFormat (:69)    | read_jdbc (same min/max split strategy built in) |
| StreamXmlRecordReader                            | read_xml_records |
| EmptyInputFormat / RandomInputFormat             | spark.range |
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(
    spark: SparkSession, path: str, glob: str | None = None, lines_per_partition: int | None = None
) -> DataFrame:
    """Lines as a `value` column (TextInputFormat). ``glob`` replaces
    PathFilter; NLineInputFormat's fan-out control becomes an explicit
    repartition (the reference used it to force task counts)."""
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.text(path)
    if lines_per_partition:
        n = max(1, df.count() // lines_per_partition)
        df = df.repartition(n)
    return df


def read_kv_text(
    spark: SparkSession, path: str, sep: str = "\t", key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """KeyValueTextInputFormat (:63): split each line at the FIRST
    separator; missing separator → empty value (reference behavior)."""
    import re as _re

    df = spark.read.text(path)
    # literal-byte separator like the reference (F.split takes a regex,
    # so '|' or '.' unescaped would split every character)
    parts = F.split(F.col("value"), _re.escape(sep), 2)
    return df.select(
        F.element_at(parts, 1).alias(key_col),
        # try_element_at: lines without a separator yield a 1-element array
        # and must map to empty value, not an ANSI out-of-bounds error.
        F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit("")).alias(value_col),
    )


def read_fixed_width(
    spark: SparkSession, path: str, widths: dict[str, int]
) -> DataFrame:
    """FixedLengthInputFormat (:50): fixed-byte records → typed columns
    via substring windows. For text storage one record per line; binary
    fixed-length records would come through format('binaryFile') +
    the same substring math."""
    df = spark.read.text(path)
    cols, off = [], 1
    for name, w in widths.items():
        cols.append(F.substring(F.col("value"), off, w).alias(name))
        off += w
    return df.select(*cols)


def read_multi(
    sources: list[tuple[DataFrame, Callable[[DataFrame], DataFrame] | None]],
    tag_col: str | None = "source_tag",
) -> DataFrame:
    """MultipleInputs / DelegatingMapper (:150 LoC): per-source transform,
    then schema-aligned union; optional provenance tag."""
    out = None
    for i, (df, fn) in enumerate(sources):
        cur = fn(df) if fn else df
        if tag_col:
            cur = cur.withColumn(tag_col, F.lit(i))
        out = cur if out is None else out.unionByName(cur, allowMissingColumns=True)
    assert out is not None, "read_multi needs at least one source"
    return out


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """DBInputFormat / DataDrivenDBInputFormat: Spark's JDBC source uses
    the identical min/max-on-a-column split strategy
    (DataDrivenDBInputFormat.java:69's $CONDITIONS token, built in)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_xml_records(
    spark: SparkSession, path: str, begin: str, end: str, record_col: str = "record"
) -> DataFrame:
    """StreamXmlRecordReader: records delimited by begin/end tags.
    Whole-file read + non-greedy regex extraction (files must fit the
    task — same constraint as the reference's unsplittable XML mode)."""
    import re as _re

    df = spark.read.text(path, wholetext=True)
    # (?s): records normally span lines; without DOTALL '(.*?)' silently
    # drops every multi-line record
    pat = "(?s)" + _re.escape(begin) + r"(.*?)" + _re.escape(end)
    return df.select(
        F.explode(F.regexp_extract_all(F.col("value"), F.lit(pat), F.lit(1))).alias(record_col)
    )


def read_sequence_file(
    spark: SparkSession, path: str, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """SequenceFile read bridge (HC/io/SequenceFile.java:219-225 'SEQ'
    magic container; MRC/mapreduce/lib/input/SequenceFileInputFormat.java:73).

    Spark has no DataFrame SequenceFile source, so a user migrating real
    Hadoop data lands here: the RDD API's ``sequenceFile`` (Writable →
    Python converters, split-aware via the sync markers) does the read,
    lifted to a DataFrame immediately — everything downstream stays
    relational. Schema is inferred from the converted key/value types."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, schema=[key_col, value_col])


def read_auto(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """AutoInputFormat (ST/AutoInputFormat.java): sniff the format and
    dispatch. The reference distinguishes SequenceFile vs text by magic
    bytes; we sniff SequenceFile ('SEQ'), Parquet ('PAR1'), ORC, JSON
    ('{'/'['), else delimited/text — from the first file's header only
    (one tiny driver-side read). A (Bloom)MapFile DIRECTORY (data +
    index [+ bloom] members) dispatches to the bloommap bridge before
    any file sniff — its members are SequenceFiles, so the magic alone
    would mis-route it to a flat scan of data AND index."""
    from hadoop_common_spark.sources.bloommap import is_bloom_map_dir, read_bloom_map

    local = _distcp_local_path(path)
    if is_bloom_map_dir(local):
        return read_bloom_map(spark, local)
    import os as _os

    if _os.path.isdir(local) and all(
        _os.path.exists(_os.path.join(local, n)) for n in ("_index", "_masterindex")
    ):  # Hadoop Archive directory
        from hadoop_common_spark.sources.har import read_har_df

        return read_har_df(spark, local)
    first = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", F.substring("content", 1, 4).alias("magic"))
        .limit(1)
        .collect()
    )
    if not first:
        raise FileNotFoundError(f"no files under {path}")
    magic = bytes(first[0].magic)
    if magic[:3] == b"SEQ":
        return read_sequence_file(spark, path)
    if magic == b"\xd1\x11\xd3\x68":  # BCFile/TFile header magic
        from hadoop_common_spark.sources.tfile import read_tfile

        return read_tfile(spark, path)
    if magic == b"PAR1":
        return spark.read.options(**options).parquet(path)
    if magic[:3] == b"ORC":
        return spark.read.options(**options).orc(path)
    if magic[:1] in (b"{", b"["):
        return spark.read.options(**options).json(path)
    return spark.read.options(**options).csv(path)


def _distcp_local_path(p: str) -> str:
    # Paths are NOT URI-encoded — urlparse would truncate names
    # containing '#' (fragment) or '?' (query); strip the scheme
    # textually instead. 'file:' keeps the leading-slash path
    # ('file:/x' and 'file:///x' both -> '/x'); any other scheme
    # keeps 'scheme://authority' INTACT so listing paths and
    # src_root stay in the same namespace and relpath never walks
    # '..'-ward out of dst.
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return p


def _md5_file(path: str) -> str:
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as f:
        for blk in iter(lambda: f.read(1 << 20), b""):
            h.update(blk)
    return h.hexdigest()


def distcp(
    spark: SparkSession,
    src: str,
    dst: str,
    glob: str | None = None,
    partitions: int = 32,
    chunk_bytes: int = 128 << 20,
    update: bool = False,
    delete: bool = False,
    checksum: bool = False,
) -> int:
    """DistCp (TOOLS/hadoop-distcp DistCp.java:52): parallel file copy as
    a Spark job. The listing is METADATA only (path + length) and stays a
    DataFrame end-to-end — skip decisions, destination pre-create, chunk
    enumeration, and the copies all run in tasks, never a driver loop, so
    a million-file tree works unchanged (the reference's SimpleCopyListing
    is driver-side; its CopyMapper work is task-side like ours).

    Each file splits into ``chunk_bytes`` byte ranges exactly as
    UniformSizeInputFormat chunks by size, so a single multi-TB file fans
    out across tasks and no task ever holds more than one chunk in
    memory. Each task preads its range from the source and pwrites it at
    the same offset in the destination; relative paths under ``src`` are
    preserved (files sharing a basename in different subtrees don't
    collide).

    ``update``: skip files whose destination already matches — same
    length, and same content checksum when ``checksum=True`` (the
    reference CopyMapper ``canSkip``/checksum compare,
    TOOLS/hadoop-distcp/.../mapred/CopyMapper.java:229-258) — re-running
    a migration then re-copies only what changed.
    ``delete``: after the copy, remove destination files with no source
    counterpart (the reference's ``-delete``).

    Requires a shared filesystem (local mode or a cluster-wide mount):
    tasks write to the destination path directly. Returns the number of
    files copied (skipped files excluded)."""
    import os

    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(src).select("path", "length")

    # src must go through the SAME normalization as the listing paths
    # (they come back as 'file:/...' / 'scheme://...' strings).
    if src.startswith("file:") or "://" in src:
        src_root = _distcp_local_path(src).rstrip("/")
    else:
        src_root = os.path.abspath(src)

    def prep(rows):
        # per-file skip decision + destination pre-create, in the tasks.
        # Pre-creating at final size (truncating) matters because chunk
        # writers use O_CREAT without truncation — re-copying a file that
        # SHRANK would otherwise leave stale tail bytes from the old copy.
        for r in rows:
            p = _distcp_local_path(r.path)
            rel = os.path.relpath(p, src_root) if p != src_root else os.path.basename(p)
            out = os.path.join(dst, rel)
            if update and os.path.isfile(out) and os.path.getsize(out) == r.length:
                if not checksum or _md5_file(out) == _md5_file(p):
                    yield (p, rel, r.length, True)
                    continue
            os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
            with open(out, "wb") as fo:
                fo.truncate(r.length)
            yield (p, rel, r.length, False)

    prepared = spark.createDataFrame(
        files.rdd.mapPartitions(prep), "path string, rel string, length long, skip boolean"
    ).localCheckpoint(eager=True)  # prep has side effects — run exactly once

    # chunk enumeration as a relational explode, not a driver loop;
    # greatest(length-1, 0) keeps one zero-length chunk for empty files
    # (their creation already happened in prep)
    todo = prepared.filter(~F.col("skip"))
    cdf = (
        todo.select(
            "path",
            "rel",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("length") - 1, F.lit(0).cast("long")),
                    F.lit(chunk_bytes).cast("long"),
                )
            ).alias("off"),
            "length",
        )
        .select(
            "path", "rel", "off",
            F.least(F.lit(chunk_bytes).cast("long"), F.col("length") - F.col("off")).alias("len"),
        )
        .repartition(partitions)
    )

    def copy_partition(rows):
        n = 0
        for r in rows:
            out = os.path.join(dst, r.rel)
            os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
            with open(r.path, "rb") as fi:
                fi.seek(r.off)
                data = fi.read(r.len)
            fd = os.open(out, os.O_WRONLY | os.O_CREAT)
            try:
                os.pwrite(fd, data, r.off)
            finally:
                os.close(fd)
            n += 1
        yield n

    copied_chunks = cdf.rdd.mapPartitions(copy_partition).sum()
    n_chunks = cdf.count()  # cheap: prepared is checkpointed, no re-prep
    n_copied = todo.count()
    assert copied_chunks == n_chunks, f"copied {copied_chunks} of {n_chunks} chunks"

    if delete:
        dst_root = os.path.abspath(dst)
        try:
            # the dst listing takes the SAME glob as the src listing: a
            # scoped sync (glob='*.parquet') must only consider in-scope
            # destination files — an unfiltered listing would delete
            # out-of-scope files that still exist in the source
            dreader = spark.read.format("binaryFile").option(
                "recursiveFileLookup", "true"
            )
            if glob:
                dreader = dreader.option("pathGlobFilter", glob)
            dst_files = dreader.load(dst).select("path")
            dst_rel = spark.createDataFrame(
                dst_files.rdd.map(
                    lambda r: (os.path.relpath(_distcp_local_path(r.path), dst_root),)
                ),
                "rel string",
            )
            extraneous = dst_rel.join(prepared.select("rel"), "rel", "left_anti")

            def rm(rows):
                for r in rows:
                    try:
                        os.remove(os.path.join(dst_root, r.rel))
                    except FileNotFoundError:
                        pass

            extraneous.rdd.foreachPartition(rm)
        except Exception:
            if os.path.isdir(dst_root):  # empty dst: binaryFile load may fail
                raise
    return n_copied or 0


def read_csv_skip_bad(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """SkipBadRecords (mapred/SkipBadRecords.java:55): the reference
    re-runs tasks in skip mode to bisect away crashing records; Spark's
    PERMISSIVE parse mode does it declaratively — malformed rows land in
    ``corrupt_col`` instead of failing the job, one pass, no re-runs.

    Note: Spark refuses queries that reference ONLY ``corrupt_col`` on
    the raw scan; select data columns alongside it, or cache()/write the
    frame first when isolating bad rows."""
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("sep", sep)
        .schema(schema + f", {corrupt_col} STRING")
        .csv(path)
    )


def sampled_scan_percent(df: DataFrame, key_col: str, frequency: int) -> DataFrame:
    """SequenceFileInputFilter.PercentFilter/MD5Filter (:153,:202): keep
    keys with hash ≡ 0 (mod frequency); md5-based → deterministic and
    engine-independent."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    return df.filter(h % frequency == 0)


def sampled_scan_regex(df: DataFrame, key_col: str, pattern: str) -> DataFrame:
    """SequenceFileInputFilter.RegexFilter (:110)."""
    return df.filter(F.col(key_col).rlike(pattern))
