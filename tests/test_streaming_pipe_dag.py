"""Structured Streaming superset, pipe operator, and JobGraph tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_common_spark.operators.pipe import pipe_lines
from hadoop_common_spark.plans.jobcontrol import JobGraph
from hadoop_common_spark.streaming.jobs import (
    read_events_stream,
    run_to_memory,
    tumbling_hourly_stream,
)


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    """The §2.10 contract: the streaming window agg equals its batch
    formulation (which is what the DuckDB oracle checks)."""
    from hadoop_common_spark.queries import load_all

    stream = read_events_stream(spark, sf_dir)
    got = run_to_memory(tumbling_hourly_stream(stream), "t_tumbling")
    batch = load_all()["window_tumbling_hourly"].fn(spark, sf_dir)
    skey = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value) for r in got.collect()
    }
    bkey = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value) for r in batch.collect()
    }
    assert skey == bkey


def test_pipe_identity_preserves_rows(spark):
    df = spark.createDataFrame([("hello", 1), ("world", 2)], ["s", "n"])
    out = pipe_lines(df, "cat", out_cols=["s", "n"])
    got = sorted((r.s, r.n) for r in out.collect())
    assert got == [("hello", "1"), ("world", "2")]


def test_pipe_external_transform(spark):
    df = spark.createDataFrame([("abc",), ("xyz",)], ["s"])
    out = pipe_lines(df, "tr a-z A-Z")
    assert sorted(r.line for r in out.collect()) == ["ABC", "XYZ"]


def test_jobgraph_order_and_results(spark):
    order = []

    def step(name, dep_val=0):
        def fn(results):
            order.append(name)
            return sum(results.get(d, 0) for d in results) + 1

        return fn

    g = JobGraph()
    g.add("load", step("load"))
    g.add("transform", step("transform"), depends_on=["load"])
    g.add("write", step("write"), depends_on=["transform"])
    results = g.run()
    assert order == ["load", "transform", "write"]
    assert set(results) == {"load", "transform", "write"}


def test_jobgraph_duplicate_raises(spark):
    g = JobGraph().add("a", lambda r: 1)
    with pytest.raises(ValueError):
        g.add("a", lambda r: 2)


def test_streaming_dedup(spark, sf_dir):
    from hadoop_common_spark.streaming.jobs import dedup_stream

    stream = read_events_stream(spark, sf_dir)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.table("t_dedup").count()
    batch_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n == batch_n  # event_id is unique → dedup is a no-op pass-through


def test_foreachbatch_incremental_materialization(spark, sf_dir, tmp_path):
    """Checkpointed foreachBatch: first run materializes, second run with
    the same checkpoint is a no-op (no new files arrived) — the
    incremental-view maintenance contract."""
    from hadoop_common_spark.streaming.jobs import materialize_incremental

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_dir)
    materialize_incremental(stream.select("event_id", "user_id"), out, ckpt)
    n_first = spark.read.parquet(out).count()
    batch_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n_first == batch_n

    materialize_incremental(
        read_events_stream(spark, sf_dir).select("event_id", "user_id"), out, ckpt
    )
    assert spark.read.parquet(out).count() == n_first  # nothing reprocessed


def test_typed_bytes_roundtrip_unit():
    """Wire-format unit check: every type code encodes/decodes losslessly,
    including values that would break the text framing (tabs, newlines,
    raw bytes, unicode, int/long boundary)."""
    import io

    from hadoop_common_spark.operators.typedbytes import tb_decode, tb_encode

    values = [
        b"\x00\xff raw",
        True,
        False,
        0,
        -1,
        2**31 - 1,
        -(2**31),
        2**31,          # -> long
        -(2**63),
        3.25,
        "tab\there\nnewline",
        "unicodé ☃",
        ["nested", 1, [2.5, b"b"]],
        {"k": 1, "j": "v"},
    ]
    buf = io.BytesIO()
    for v in values:
        tb_encode(v, buf)
    stream = io.BufferedReader(io.BytesIO(buf.getvalue()))
    got = []
    while True:
        try:
            got.append(tb_decode(stream))
        except EOFError:
            break
    assert got == values


def test_pipe_typed_bytes_identity_binary_safe(spark):
    """`cat` is a valid typed-bytes child (the framing is self-
    delimiting): rows with embedded tabs/newlines and typed numbers
    survive the pipe intact — exactly what the text framing cannot do."""
    from pyspark.sql import types as T

    from hadoop_common_spark.operators.typedbytes import pipe_typed_bytes

    rows = [("a\tb\nc", 7, 1.5), ("plain", -(2**40), 0.25)]
    df = spark.createDataFrame(rows, ["s", "n", "x"])
    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    out = pipe_typed_bytes(df, ["cat"], schema)
    assert sorted((r.s, r.n, r.x) for r in out.collect()) == sorted(rows)


def test_pipe_typed_bytes_external_transform(spark, tmp_path):
    """A real child speaking typed-bytes: upper-cases the string field and
    doubles the int field (ST -io typedbytes contract, child side)."""
    import sys

    from pyspark.sql import types as T

    from hadoop_common_spark.operators.typedbytes import pipe_typed_bytes

    child = tmp_path / "tb_child.py"
    child.write_text(
        """
import io, struct, sys
inp = sys.stdin.buffer
out = sys.stdout.buffer

def dec(s):
    c = s.read(1)
    if not c:
        raise EOFError
    c = c[0]
    if c == 3:
        return struct.unpack(">i", s.read(4))[0]
    if c == 4:
        return struct.unpack(">q", s.read(8))[0]
    if c == 7:
        n = struct.unpack(">i", s.read(4))[0]
        return s.read(n).decode()
    if c == 8:
        n = struct.unpack(">i", s.read(4))[0]
        return [dec(s) for _ in range(n)]
    raise ValueError(c)

def enc_str(v):
    b = v.encode()
    return struct.pack(">Bi", 7, len(b)) + b

while True:
    try:
        s, n = dec(inp)
    except EOFError:
        break
    out.write(struct.pack(">Bi", 8, 2) + enc_str(s.upper()) + struct.pack(">Bi", 3, n * 2))
out.flush()
"""
    )
    df = spark.createDataFrame([("abc", 1), ("xyz", 21)], ["s", "n"])
    schema = T.StructType(
        [T.StructField("s", T.StringType()), T.StructField("n", T.IntegerType())]
    )
    out = pipe_typed_bytes(df, [sys.executable, str(child)], schema)
    assert sorted((r.s, r.n) for r in out.collect()) == [("ABC", 2), ("XYZ", 42)]


def test_pipe_raw_bytes_identity_binary_safe(spark):
    """-io rawbytes round-trip (TestRawBytesStreaming analog): `cat` is a
    valid child (length prefixes self-delimit); payloads with tabs,
    newlines, NULs, and invalid-UTF8 bytes survive intact — the text
    framing would mangle every one of these."""
    from hadoop_common_spark.operators.typedbytes import pipe_raw_bytes

    rows = [
        (bytearray(b"k\t1\n"), bytearray(b"\x00\xff\xfe raw \n\t bytes")),
        (bytearray(b""), bytearray(b"\x80\x81not-utf8")),
        (bytearray(b"\n\n"), bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "key binary, value binary")
    out = pipe_raw_bytes(df, ["cat"])
    got = sorted((bytes(r.key), bytes(r.value)) for r in out.collect())
    assert got == sorted((bytes(k), bytes(v)) for k, v in rows)


def test_pipe_raw_bytes_one_column_raises(spark):
    """A 1-column frame without explicit key/value columns is a clear
    error up front, not an IndexError mid-plan."""
    import pytest

    from hadoop_common_spark.operators.typedbytes import pipe_raw_bytes

    df = spark.createDataFrame([(bytearray(b"only"),)], "key binary")
    with pytest.raises(ValueError, match="key and a value column"):
        pipe_raw_bytes(df, ["cat"])


def test_pipe_raw_bytes_corrupt_length_prefix_fails_loudly(spark):
    """A child emitting a negative length prefix is a framing error, not
    a silent rest-of-stream slurp into one garbage record."""
    import sys

    import pytest

    from hadoop_common_spark.operators.typedbytes import pipe_raw_bytes

    df = spark.createDataFrame([(bytearray(b"k"), bytearray(b"v"))], "key binary, value binary")
    # child ignores stdin and emits a corrupt (negative) length prefix
    evil = (
        "import sys,struct;sys.stdin.buffer.read();"
        "sys.stdout.buffer.write(struct.pack('>i',-5)+b'xxxxx')"
    )
    out = pipe_raw_bytes(df, [sys.executable, "-c", evil])
    with pytest.raises(Exception, match="invalid rawbytes length|ValueError"):
        out.collect()


def test_pipe_raw_bytes_external_transform(spark, tmp_path):
    """A real child speaking rawbytes (RawBytesInputWriter framing:
    4-byte big-endian length + raw bytes, key then value): reverses each
    value. String columns are UTF-8 encoded on the way in."""
    import sys

    from hadoop_common_spark.operators.typedbytes import pipe_raw_bytes

    child = tmp_path / "rb_child.py"
    child.write_text(
        """
import struct, sys
inp, out = sys.stdin.buffer, sys.stdout.buffer
def blob():
    hdr = inp.read(4)
    if not hdr:
        return None
    (n,) = struct.unpack(">i", hdr)
    return inp.read(n)
while True:
    k = blob()
    if k is None:
        break
    v = blob()
    rv = v[::-1]
    out.write(struct.pack(">i", len(k)) + k + struct.pack(">i", len(rv)) + rv)
out.flush()
"""
    )
    df = spark.createDataFrame([("k1", "abc"), ("k2", "wxyz")], ["k", "v"])
    out = pipe_raw_bytes(df, [sys.executable, str(child)], "k", "v")
    got = sorted((bytes(r.key), bytes(r.value)) for r in out.collect())
    assert got == [(b"k1", b"cba"), (b"k2", b"zyxw")]


def test_pipe_raw_bytes_rejects_non_bytes_columns(spark):
    """An int column must raise, not frame as bytes(n) == n ZERO bytes
    (silent corruption; a huge id would even allocate GBs)."""
    import pytest as _pytest

    from hadoop_common_spark.operators.typedbytes import pipe_raw_bytes

    df = spark.createDataFrame([(5, "v")], ["k", "v"])
    with _pytest.raises(Exception, match="rawbytes framing|BINARY or STRING"):
        pipe_raw_bytes(df, ["cat"]).collect()


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream watermarked interval join == its batch twin
    (view_click_attribution, the oracle-checked formulation). Inner join
    + availableNow: every in-horizon match is emitted once the watermark
    passes; with a bounded input the full drain must equal batch."""
    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.streaming.jobs import view_click_attribution_stream

    stream = read_events_stream(spark, sf_dir)
    q = (
        view_click_attribution_stream(stream)
        .writeStream.format("memory")
        .queryName("t_attr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.click_id, r.view_id) for r in spark.table("t_attr").collect()}
    batch = load_all()["view_click_attribution"].fn(spark, sf_dir)
    want = {(r.click_id, r.view_id) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_multires_incremental_matches_batch(spark, sf_dir, tmp_path):
    """The incrementally maintained rollup (micro-batch partials folded)
    must equal the one-pass batch query over the same events — for any
    batching (here: events split into 3 files, streamed file-wise)."""
    from hadoop_common_spark.streaming.jobs import (
        multires_rollup_incremental,
        read_multires_rollup,
    )
    from hadoop_common_spark.tables import register_views

    register_views(spark, sf_dir)
    events = spark.table("events")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    multires_rollup_incremental(stream, out, ckpt)

    from hadoop_common_spark.queries import load_all

    batch = load_all()["events_multires_rollup"].fn(spark, sf_dir)
    got = {
        (r.resolution, r.bucket): (r.n_events, r.min_value, r.max_value)
        for r in read_multires_rollup(spark, out).collect()
    }
    want = {
        (r.resolution, r.bucket): (r.n_events, r.min_value, r.max_value)
        for r in batch.collect()
    }
    assert got == want

    # idempotent resume: re-running with the same checkpoint appends nothing
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    multires_rollup_incremental(stream2, out, ckpt)
    again = {
        (r.resolution, r.bucket): (r.n_events, r.min_value, r.max_value)
        for r in read_multires_rollup(spark, out).collect()
    }
    assert again == want


def test_typed_bytes_null_roundtrip():
    """Review regression: SQL NULL must survive the typed-bytes pipe as
    None, not collapse to b''."""
    import io

    from hadoop_common_spark.operators.typedbytes import tb_decode, tb_encode

    buf = io.BytesIO()
    for v in [None, "x", 3, [None, 1.5], {"k": None}]:
        tb_encode(v, buf)
    buf.seek(0)
    got = [tb_decode(buf) for _ in range(5)]
    assert got == [None, "x", 3, [None, 1.5], {"k": None}]


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    """Stream-static broadcast enrichment == its batch twin: per-type
    dimension attributes attached to every event, aggregated per
    attribute to compare compactly."""
    from pyspark.sql import functions as F

    from hadoop_common_spark.streaming.jobs import (
        enrich_stream_static,
        read_events_stream,
        run_to_memory,
    )
    from hadoop_common_spark.tables import load_tables

    dim = spark.createDataFrame(
        [("view", 1), ("click", 5), ("purchase", 50), ("signup", 20), ("logout", 0)],
        ["event_type", "weight"],
    )
    stream = read_events_stream(spark, sf_dir)
    enriched = enrich_stream_static(stream, dim, "event_type").groupBy("weight").count()
    got = {
        (r.weight, r["count"])
        for r in run_to_memory(enriched, "enrich_test").collect()
    }
    ev = load_tables(spark, sf_dir)["events"]
    want = {
        (r.weight, r["count"])
        for r in ev.join(dim, "event_type", "left").groupBy("weight").count().collect()
    }
    assert got == want and len(got) >= 3


def test_mapside_minhash_signature_equals_groupby_form(spark, sf_dir):
    """minhash_signature_mapside must produce IDENTICAL h0..h15 to the
    explode+groupBy form — the band keys of the streaming path and the
    batch corpus index only join correctly if the signatures agree
    bit-for-bit."""
    from hadoop_common_spark.operators.dedup import (
        minhash_signature,
        minhash_signature_mapside,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    a = {tuple(r) for r in minhash_signature(docs, "doc_id", "text").collect()}
    b = {tuple(r) for r in minhash_signature_mapside(docs, "doc_id", "text").collect()}
    assert a == b and len(a) > 0


def test_streaming_neardup_candidates_match_batch(spark, sf_dir, tmp_path):
    """neardup_candidates_stream over a document stream equals the same
    pipeline applied in batch: stateless map-side signing + stream-static
    band-index join, drained with availableNow (append mode — no
    aggregation state anywhere)."""
    from hadoop_common_spark.operators.dedup import lsh_band_keys, minhash_signature
    from hadoop_common_spark.streaming.jobs import neardup_candidates_stream

    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index = lsh_band_keys(
        minhash_signature(corpus, "doc_id", "text"), "doc_id", 4, 4
    ).localCheckpoint(eager=True)

    batch_schema = corpus.schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    out = neardup_candidates_stream(stream, index)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("t_neardup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_neardup").collect()
    got = {tuple(r) for r in rows}

    twin = {tuple(r) for r in neardup_candidates_stream(corpus, index).collect()}
    assert got == twin
    # self-matches are excluded; the synthetic corpus has real near-dups
    assert len(got) > 0
    assert all(r["stream_id"] != r["corpus_id"] for r in rows)


def test_transform_with_state_distinct_types_matches_batch(spark, sf_dir):
    """transformWithState (Spark 4.x arbitrary-state API): an
    availableNow drain of the MapState-backed distinct-type counter must
    equal batch count_distinct per user. outputMode=update emits a row
    per (batch, touched user); the LAST row per user is the final state.
    protobuf comes from the real wheel or the third_party bridge
    (ensure_protobuf); only a runtime with neither skips — the
    applyInPandasWithState twin below covers that case."""
    from pyspark.sql import functions as F

    from hadoop_common_spark.streaming.stateful import (
        distinct_event_types_tws,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("google.protobuf unavailable: TWS driver worker cannot start")

    stream = read_events_stream(spark, sf_dir)
    # TWS keeps one column family per state variable; the default
    # HDFSBacked provider is single-family, so the query needs RocksDB
    # (what a production deployment runs anyway). Scoped to this query:
    # the provider is captured at query start from the session conf.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            distinct_event_types_tws(stream)
            .writeStream.format("memory")
            .queryName("t_tws_distinct")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
    # single-source availableNow drain → one batch → one row per user
    got = {r.user_id: r.n_types for r in spark.table("t_tws_distinct").collect()}
    batch = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("n"))
        .collect()
    }
    assert got == batch


def test_tws_topk_maintainer_matches_batch(spark, sf_dir):
    """ListState bounded top-k maintainer (r8): an availableNow drain's
    final emission per user must equal the oracle-backed batch twin
    stream_topk_per_user_batch. State never exceeds k rows per user —
    the unbounded-stream property the batch window can't claim."""
    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.streaming.stateful import (
        topk_events_tws,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("google.protobuf unavailable: TWS driver worker cannot start")

    stream = read_events_stream(spark, sf_dir)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            topk_events_tws(stream, k=3)
            .writeStream.format("memory")
            .queryName("t_tws_topk")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
    # single-source availableNow drain -> one batch -> emissions final
    got = sorted(
        (r.user_id, r.event_id, r.value, r.rnk)
        for r in spark.table("t_tws_topk").collect()
    )
    batch = sorted(
        (r.user_id, r.event_id, r.value, r.rnk)
        for r in load_all()["stream_topk_per_user_batch"].fn(spark, sf_dir).collect()
    )
    assert got == batch and len(got) > 0


def test_tws_session_expiry_matches_batch(spark, sf_dir, tmp_path):
    """Timer-driven session expiry (r8): drain the events through the
    ValueState+timer maintainer with two far-future flush batches (the
    watermark only advances BETWEEN batches, and event-time timers fire
    against the PREVIOUS batch's max — two flushes guarantee every real
    session's timer fires), then compare the emitted session set to the
    oracle-backed batch twin stream_session_expiry_batch."""
    from pyspark.sql import functions as F

    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.streaming.stateful import (
        session_expiry_tws,
        transform_with_state_available,
    )
    from hadoop_common_spark.tables import load_tables

    if not transform_with_state_available():
        pytest.skip("google.protobuf unavailable: TWS driver worker cannot start")

    import datetime
    import glob
    import os
    import shutil

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    ev = load_tables(spark, sf_dir)["events"].select("user_id", "event_id", "ts")
    far = ev.agg(F.max("ts").alias("m")).collect()[0].m

    def add_file(df, name, mtime):
        # the file source lists FLAT files (it does not recurse into
        # per-write directories): write, then move the single part file
        # into src under a controlled name + mtime (discovery order)
        w = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(w)
        dst = os.path.join(src, name)
        shutil.move(glob.glob(w + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    # f0 = all real events as ONE batch; f1/f2 = sentinel-user flush
    # batches 10y/20y out, each its own batch via maxFilesPerTrigger
    add_file(ev, "f0.parquet", 1_000_000)
    for i, yrs in ((1, 3650), (2, 7300)):
        add_file(
            spark.createDataFrame(
                [(-1, -i, far + datetime.timedelta(days=yrs))],
                "user_id bigint, event_id bigint, ts timestamp",
            ),
            f"f{i}.parquet",
            1_000_000 + i,
        )
    schema = spark.read.parquet(f"{src}/f0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            session_expiry_tws(stream, gap_sec=1800)
            .writeStream.format("memory")
            .queryName("t_tws_sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("t_tws_sessions").collect()
        if r.user_id >= 0
    )
    batch = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in load_all()["stream_session_expiry_batch"].fn(spark, sf_dir).collect()
    )
    assert got == batch and len(got) > 0


def test_tws_topk_initial_state_bootstrap(spark, sf_dir, tmp_path):
    """State bootstrap (handleInitialState): seed the ListState top-k
    maintainer with a batch snapshot of the OLD half of events, stream
    only the NEW half — for every user touched by the new half, the
    final emission must equal the batch top-k over ALL events. The
    production restart pattern: yesterday's materialized answer +
    today's increment == full recompute."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hadoop_common_spark.streaming.stateful import (
        topk_events_tws,
        transform_with_state_available,
    )
    from hadoop_common_spark.tables import load_tables

    if not transform_with_state_available():
        pytest.skip("google.protobuf unavailable: TWS driver worker cannot start")

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", "value"
    )
    old = ev.filter(F.col("event_id") % 2 == 0)
    new = ev.filter(F.col("event_id") % 2 == 1)
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    seed = (
        old.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= 3).drop("_r")
    )
    src = str(tmp_path / "new_half")
    new.write.parquet(src)
    stream = spark.readStream.schema(new.schema).parquet(src)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            topk_events_tws(stream, k=3, initial_state=seed)
            .writeStream.format("memory")
            .queryName("t_tws_topk_boot")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
    got = sorted(
        (r.user_id, r.event_id, r.value, r.rnk)
        for r in spark.table("t_tws_topk_boot").collect()
    )
    touched = {u.user_id for u in new.select("user_id").distinct().collect()}
    full = (
        ev.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )
    want = sorted(
        (r.user_id, r.event_id, r.value, r.rnk)
        for r in full.collect()
        if r.user_id in touched
    )
    assert got == want and len(got) > 0


def test_tws_session_expiry_initial_state_bootstrap(spark, sf_dir, tmp_path):
    """Restart pattern for the TIMER operator: seed the maintainer with
    the previous run's OPEN sessions (each user's last old-half island)
    — handleInitialState must store the state AND re-arm the expiry
    timer — then drain only the new half (+ flushes). The emitted set
    must equal full-data sessionization minus the sessions the previous
    run already emitted (every old island except each user's last). A
    seeded user with NO new events must still emit via the re-armed
    timer — the part a state-only bootstrap would silently drop."""
    import datetime
    import glob
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hadoop_common_spark.streaming.stateful import (
        session_expiry_tws,
        transform_with_state_available,
    )
    from hadoop_common_spark.tables import load_tables

    if not transform_with_state_available():
        pytest.skip("google.protobuf unavailable: TWS driver worker cannot start")

    ev = load_tables(spark, sf_dir)["events"].select("user_id", "event_id", "ts")

    def islands(df):
        d = df.select("user_id", "event_id", F.expr("CAST(ts AS LONG)").alias("e"))
        w = Window.partitionBy("user_id").orderBy("e", "event_id")
        flagged = d.withColumn("_prev", F.lag("e").over(w)).withColumn(
            "ns",
            F.when(
                F.col("_prev").isNull() | (F.col("e") - F.col("_prev") > 1800),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        sess = flagged.withColumn(
            "sid", F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        return sess.groupBy("user_id", "sid").agg(
            F.min("e").alias("session_start"),
            F.max("e").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )

    mid = ev.agg(F.expr("percentile(CAST(ts AS LONG), 0.5)").alias("m")).collect()[0].m
    old = ev.filter(F.expr("CAST(ts AS LONG)") <= int(mid))
    new = ev.filter(F.expr("CAST(ts AS LONG)") > int(mid))
    old_islands = islands(old).cache()
    last_sid = old_islands.groupBy("user_id").agg(F.max("sid").alias("sid"))
    seed = old_islands.join(last_sid, ["user_id", "sid"]).drop("sid")
    emitted_before = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in old_islands.join(
            last_sid, ["user_id", "sid"], "left_anti"
        ).collect()
    }

    src = str(tmp_path / "boot_src")
    os.makedirs(src)
    far = ev.agg(F.max("ts").alias("m")).collect()[0].m

    def add_file(df, name, mtime):
        w = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(w)
        dst = os.path.join(src, name)
        shutil.move(glob.glob(w + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    add_file(new, "f0.parquet", 1_000_000)
    for i, yrs in ((1, 3650), (2, 7300)):
        add_file(
            spark.createDataFrame(
                [(-1, -i, far + datetime.timedelta(days=yrs))],
                "user_id bigint, event_id bigint, ts timestamp",
            ),
            f"f{i}.parquet",
            1_000_000 + i,
        )
    schema = spark.read.parquet(f"{src}/f0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            session_expiry_tws(stream, gap_sec=1800, initial_state=seed)
            .writeStream.format("memory")
            .queryName("t_tws_sess_boot")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("t_tws_sess_boot").collect()
        if r.user_id >= 0
    )
    want = sorted(
        t
        for t in (
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in islands(ev).drop("sid").collect()
        )
        if t not in emitted_before
    )
    old_islands.unpersist()
    assert got == want and len(got) > 0
    # the timer-re-arm check has teeth only if some seeded user got no
    # new events yet still emitted
    new_users = {u.user_id for u in new.select("user_id").distinct().collect()}
    assert any(u not in new_users for (u, *_rest) in got) or len(new_users) == len(
        {u for (u, *_r) in got}
    )


def test_state_ewma_multibatch_carries_state(spark, sf_dir):
    """Cross-BATCH state carry: drain the same events split into two
    event-time-ordered files one-file-per-trigger (>= 2 micro-batches,
    asserted via recentProgress) and the final per-user emission must be
    bit-identical to the one-batch drain — the (ewma, count) state is
    the ONLY thing connecting the batches, so any carry bug diverges.
    The split cuts at a ts strictly between two distinct values so no
    per-user (ts, event_id) order straddles the batch boundary out of
    order (the maintainer's documented in-order contract)."""
    import os
    import shutil
    import tempfile

    from hadoop_common_spark.streaming.stateful import ewma_state
    from hadoop_common_spark.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    cuts = [
        r[0]
        for r in ev.select(F.col("ts").cast("long"))
        .distinct()
        .orderBy("ts")
        .collect()
    ]
    cut = cuts[len(cuts) // 2]  # strictly between: split is < cut vs >= cut

    d = tempfile.mkdtemp(prefix="hcs_ewma_mb_")
    try:
        for i, part in enumerate(
            (ev.filter(F.col("ts").cast("long") < cut),
             ev.filter(F.col("ts").cast("long") >= cut))
        ):
            stage = f"{d}/_stage{i}"
            part.coalesce(1).write.parquet(stage)
            pf = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
            os.rename(f"{stage}/{pf}", f"{d}/{i:02d}_events.parquet")
            shutil.rmtree(stage)
            # file-source order is mtime: pin it explicitly
            os.utime(f"{d}/{i:02d}_events.parquet", (1_000_000 + i, 1_000_000 + i))

        schema = spark.read.parquet(f"{d}/00_events.parquet").schema

        def drain(name: str, **opts):
            reader = spark.readStream.schema(schema)
            for k, v in opts.items():
                reader = reader.option(k, v)
            q = (
                ewma_state(reader.parquet(d))
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            n_data_batches = sum(
                1 for p in q.recentProgress if p["numInputRows"] > 0
            )
            return (
                sorted(
                    (r.user_id, r.n_events, r.ewma_value)
                    for r in spark.table(name).collect()
                ),
                n_data_batches,
            )

        one, n1 = drain("t_ewma_mb_one")
        multi, nm = drain("t_ewma_mb_multi", maxFilesPerTrigger="1")
        assert nm >= 2, f"multi-batch drain ran {nm} data batches"
        # the memory sink keeps every update-mode emission; per-user the
        # LAST one is the final state, and sorted() puts it last because
        # n_events grows — compare the per-user maxima
        final = lambda rows: {
            u: max((t for t in rows if t[0] == u), key=lambda t: t[1])
            for u in {r[0] for r in rows}
        }
        assert final(multi) == final(one) and len(final(one)) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_state_topk_multibatch_carries_state(spark, sf_dir):
    """Cross-batch state carry for the top-k maintainer: top-k by
    (value desc, event_id) is a commutative monoid, so a two-file
    one-file-per-trigger drain (any split — here event_id parity) must
    end with every user's final emission equal to the batch twin's
    rows. foreachBatch captures emissions WITH batch ids (update-mode
    memory sinks interleave re-emissions), and the final ranking per
    user is its highest-batch emission."""
    import os
    import shutil
    import tempfile

    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.streaming.stateful import topk_events_state
    from hadoop_common_spark.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    d = tempfile.mkdtemp(prefix="hcs_topk_mb_")
    try:
        for i, part in enumerate(
            (ev.filter(F.pmod("event_id", F.lit(2)) == 0),
             ev.filter(F.pmod("event_id", F.lit(2)) == 1))
        ):
            stage = f"{d}/_stage{i}"
            part.coalesce(1).write.parquet(stage)
            pf = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
            os.rename(f"{stage}/{pf}", f"{d}/{i:02d}_events.parquet")
            shutil.rmtree(stage)
            os.utime(f"{d}/{i:02d}_events.parquet", (1_000_000 + i, 1_000_000 + i))

        schema = spark.read.parquet(f"{d}/00_events.parquet").schema
        batches: list[tuple[int, list]] = []

        def sink(df, bid):
            batches.append((bid, df.collect()))

        q = (
            topk_events_state(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(d),
                k=3,
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert sum(1 for _, rows in batches if rows) >= 2

        last: dict[int, list] = {}
        for _, rows in sorted(batches, key=lambda t: t[0]):
            for u in {r.user_id for r in rows}:
                last[u] = [
                    (r.user_id, r.event_id, r.value, r.rnk)
                    for r in rows
                    if r.user_id == u
                ]
        got = sorted(t for rows in last.values() for t in rows)
        want = sorted(
            (r.user_id, r.event_id, r.value, r.rnk)
            for r in load_all()["stream_topk_per_user_batch"].fn(spark, sf_dir).collect()
        )
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_state_ewma_matches_batch(spark, sf_dir):
    """The streaming EWMA maintainer's final emission per user must be
    BIT-IDENTICAL to the oracle-backed batch twin events_user_ewma
    after a single-batch availableNow drain (same fold, same (ts,
    event_id) order, two numbers of state instead of the collected
    history array)."""
    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.streaming.stateful import ewma_state

    stream = read_events_stream(spark, sf_dir)
    q = (
        ewma_state(stream)
        .writeStream.format("memory")
        .queryName("t_state_ewma")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.n_events, r.ewma_value)
        for r in spark.table("t_state_ewma").collect()
    )
    batch = sorted(
        (r.user_id, r.n_events, r.ewma_value)
        for r in load_all()["events_user_ewma"].fn(spark, sf_dir).collect()
    )
    assert got == batch and len(got) > 0


def test_state_topk_maintainer_matches_batch(spark, sf_dir):
    """applyInPandasWithState twin of the ListState top-k maintainer
    (runs on any runtime): drain's final emission per user equals the
    oracle-backed batch twin."""
    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.streaming.stateful import topk_events_state

    stream = read_events_stream(spark, sf_dir)
    q = (
        topk_events_state(stream, k=3)
        .writeStream.format("memory")
        .queryName("t_state_topk")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.event_id, r.value, r.rnk)
        for r in spark.table("t_state_topk").collect()
    )
    batch = sorted(
        (r.user_id, r.event_id, r.value, r.rnk)
        for r in load_all()["stream_topk_per_user_batch"].fn(spark, sf_dir).collect()
    )
    assert got == batch and len(got) > 0


def test_state_session_expiry_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState twin of the timer-driven session expiry
    (EventTimeTimeout plays the timer): same flush-batch drain as the
    TWS test, same batch-twin equality."""
    from pyspark.sql import functions as F

    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.streaming.stateful import session_expiry_state
    from hadoop_common_spark.tables import load_tables

    import datetime
    import glob
    import os
    import shutil

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    ev = load_tables(spark, sf_dir)["events"].select("user_id", "event_id", "ts")
    far = ev.agg(F.max("ts").alias("m")).collect()[0].m

    def add_file(df, name, mtime):
        w = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(w)
        dst = os.path.join(src, name)
        shutil.move(glob.glob(w + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    add_file(ev, "f0.parquet", 1_000_000)
    for i, yrs in ((1, 3650), (2, 7300)):
        add_file(
            spark.createDataFrame(
                [(-1, -i, far + datetime.timedelta(days=yrs))],
                "user_id bigint, event_id bigint, ts timestamp",
            ),
            f"f{i}.parquet",
            1_000_000 + i,
        )
    schema = spark.read.parquet(f"{src}/f0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        session_expiry_state(stream, gap_sec=1800)
        .writeStream.format("memory")
        .queryName("t_state_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("t_state_sessions").collect()
        if r.user_id >= 0
    )
    batch = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in load_all()["stream_session_expiry_batch"].fn(spark, sf_dir).collect()
    )
    assert got == batch and len(got) > 0


def test_tws_session_expiry_late_event_merges(spark, tmp_path):
    """Late-event semantics pin: an event OLDER than the watermark that
    arrives while its session is still open (timer unexpired) merges
    into that session — it is not dropped (the eventTime column is
    projected away before the groupBy) and does not fork a duplicate
    session. The emitted session covers both events."""
    import datetime
    import glob
    import os
    import shutil

    from hadoop_common_spark.streaming.stateful import (
        session_expiry_tws,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("google.protobuf unavailable: TWS driver worker cannot start")

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    base = datetime.datetime(2024, 1, 1)

    def add(rows, name, mtime):
        w = str(tmp_path / f"w_{name}")
        spark.createDataFrame(
            rows, "user_id bigint, event_id bigint, ts timestamp"
        ).coalesce(1).write.parquet(w)
        dst = os.path.join(src, name)
        shutil.move(glob.glob(w + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    add([(1, 1, base)], "f0.parquet", 100)
    add([(-1, -1, base + datetime.timedelta(days=3650))], "f1.parquet", 101)
    # late for the stream (watermark is ~10y ahead) but within the open
    # session's gap in EVENT time
    add([(1, 2, base + datetime.timedelta(seconds=900))], "f2.parquet", 102)
    add([(-1, -2, base + datetime.timedelta(days=7300))], "f3.parquet", 103)
    schema = spark.read.parquet(f"{src}/f0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            session_expiry_tws(stream, gap_sec=1800)
            .writeStream.format("memory")
            .queryName("t_tws_late")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
    e0 = int(base.replace(tzinfo=datetime.timezone.utc).timestamp())
    got = [
        (r.session_start, r.session_end, r.n_events)
        for r in spark.table("t_tws_late").collect()
        if r.user_id == 1
    ]
    assert got == [(e0, e0 + 900, 2)]


def test_apply_in_pandas_with_state_distinct_types_matches_batch(spark, sf_dir):
    """The applyInPandasWithState twin (runs on any runtime): availableNow
    drain equals batch count_distinct per user."""
    from pyspark.sql import functions as F

    from hadoop_common_spark.streaming.stateful import distinct_event_types_state

    stream = read_events_stream(spark, sf_dir)
    q = (
        distinct_event_types_state(stream)
        .writeStream.format("memory")
        .queryName("t_state_distinct")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.user_id: r.n_types for r in spark.table("t_state_distinct").collect()}
    batch = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("n"))
        .collect()
    }
    assert got == batch


def test_incremental_weighted_sample_equals_batch(spark, sf_dir, tmp_path):
    """Draining the documents table through the incremental A-ES
    maintainer must produce EXACTLY the batch sample (deterministic
    keys make running-top-k a lossless merge, not an approximation),
    and a second drain with the same checkpoint must be a no-op."""
    from pyspark.sql import functions as F

    from hadoop_common_spark.operators.sort import top_k, weighted_sample_keys
    from hadoop_common_spark.streaming.jobs import weighted_sample_incremental

    docs_batch = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("n_chars") > 0
    )
    stream = (
        spark.readStream.schema(docs_batch.schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
        .filter(F.col("n_chars") > 0)
    )
    out = str(tmp_path / "sample")
    ckpt = str(tmp_path / "ckpt")
    weighted_sample_incremental(stream, out, ckpt, 50, "n_chars", "doc_id")

    got = {
        (r._id, r._w) for r in spark.read.parquet(out).collect()
    }
    keyed = docs_batch.select(
        F.col("doc_id").alias("_id"),
        F.col("n_chars").cast("bigint").alias("_w"),
        weighted_sample_keys(F.col("n_chars"), F.col("doc_id")).alias("_k"),
    )
    want = {
        (r._id, r._w)
        for r in top_k(keyed, 50, [F.col("_k").desc(), F.col("_id").asc()]).collect()
    }
    assert got == want
    assert len(got) == 50

    # re-drain: checkpoint replays nothing, target unchanged
    stream2 = (
        spark.readStream.schema(docs_batch.schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
        .filter(F.col("n_chars") > 0)
    )
    weighted_sample_incremental(stream2, out, ckpt, 50, "n_chars", "doc_id")
    got2 = {(r._id, r._w) for r in spark.read.parquet(out).collect()}
    assert got2 == got


def test_incremental_hll_equals_batch(spark, sf_dir, tmp_path):
    """Draining events through the incremental HLL maintainer in 4
    interleaved micro-batches (id % 4 file split — adversarial batch
    partitioning) must produce EXACTLY the batch registers (max is a
    monoid, so the fold is the identical sketch, not an approximation),
    and therefore the identical estimate; a re-drain with the same
    checkpoint is a no-op."""
    from pyspark.sql import functions as F

    from hadoop_common_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from hadoop_common_spark.streaming.jobs import hll_incremental

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "src")
    for i in range(4):
        ev.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        hll_incremental(
            stream, str(tmp_path / "regs"), str(tmp_path / "ckpt"),
            "event_type", "user_id",
        )

    drain()
    got_regs = {
        (r.event_type, r.reg): r.m
        for r in spark.read.parquet(str(tmp_path / "regs")).collect()
    }
    want_regs = {
        (r.event_type, r.reg): r.m
        for r in hll_registers(ev, ["event_type"], "user_id").collect()
    }
    assert got_regs == want_regs and len(got_regs) > 0

    got_est = {
        r.event_type: r.hll_estimate
        for r in hll_estimate(
            spark.read.parquet(str(tmp_path / "regs")), ["event_type"]
        ).collect()
    }
    want_est = {
        r.event_type: r.hll_estimate
        for r in hll_estimate(
            hll_registers(ev, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    assert got_est == want_est  # bit-identical, not approximately

    drain()  # checkpoint replays nothing
    got2 = {
        (r.event_type, r.reg): r.m
        for r in spark.read.parquet(str(tmp_path / "regs")).collect()
    }
    assert got2 == got_regs


def test_incremental_ohlc_equals_batch(spark, sf_dir, tmp_path):
    """Draining events through the OHLC maintainer in 4 interleaved
    micro-batches must produce EXACTLY the batch bars (every state
    component is a monoid), and a re-drain is a no-op."""
    from pyspark.sql import functions as F

    from hadoop_common_spark.operators.aggregate import (
        ohlc_aggregate,
        ohlc_finalize,
    )
    from hadoop_common_spark.streaming.jobs import ohlc_incremental
    from hadoop_common_spark.tables import load_tables

    # bare parquet reads may yield TIMESTAMP_NTZ (on which CAST AS LONG
    # is an analysis error) — load_tables normalizes to an instant type
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type",
        (F.col("ts").cast("long") / 3600).cast("bigint").alias("hour_bucket"),
        F.col("ts").cast("long").alias("sec"),
        "event_id",
        "value",
    )
    src = str(tmp_path / "src")
    for i in range(4):
        ev.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ohlc_incremental(
            stream, str(tmp_path / "bars"), str(tmp_path / "ckpt"),
            ["event_type", "hour_bucket"], "sec", "event_id", "value",
        )

    def bars(df):
        return {
            (r.event_type, r.hour_bucket): (r.open, r.high, r.low, r.close, r.n_events)
            for r in ohlc_finalize(df).collect()
        }

    drain()
    got = bars(spark.read.parquet(str(tmp_path / "bars")))
    want = bars(
        ohlc_aggregate(
            ev, ["event_type", "hour_bucket"], "sec", "event_id", "value"
        )
    )
    assert got == want and len(got) > 100

    drain()
    assert bars(spark.read.parquet(str(tmp_path / "bars"))) == got


def test_fold_state_batch_replay_guard(spark, tmp_path):
    """A redelivered batch_id must NOT re-fold: n_events is a sum, so
    without the _bid guard a replayed OHLC batch double-counts (the
    at-least-once crash-between-write-and-commit window)."""
    from pyspark.sql import functions as F

    from hadoop_common_spark.operators.aggregate import ohlc_aggregate, ohlc_merge
    from hadoop_common_spark.streaming.jobs import _fold_state_batch

    out = str(tmp_path / "state")
    rows = spark.createDataFrame(
        [("a", 1, 10, 1, 5.0), ("a", 1, 11, 2, 7.0)],
        "g string, bkt int, sec long, id long, v double",
    )
    state = ohlc_aggregate(rows, ["g", "bkt"], "sec", "id", "v")
    merge = lambda m: ohlc_merge(m, ["g", "bkt"])

    _fold_state_batch(spark, state, out, merge, batch_id=0)
    first = spark.read.parquet(out).collect()
    # replay of batch 0: must be a no-op
    _fold_state_batch(spark, state, out, merge, batch_id=0)
    assert spark.read.parquet(out).collect() == first
    assert first[0].n_events == 2
    # a genuinely new batch folds and advances the high-water mark
    _fold_state_batch(spark, state, out, merge, batch_id=1)
    after = spark.read.parquet(out).collect()
    assert after[0].n_events == 4 and after[0]._bid == 1


def test_fold_state_crash_recovery(spark, tmp_path):
    """The staged-write swap protocol must survive every crash window:
    a committed staging dir with out_path missing is promoted (newer
    state wins), a committed __old with nothing newer is restored, and
    a partial out_path (no _SUCCESS — the legacy in-place overwrite's
    failure mode) raises instead of silently folding onto truncation."""
    import shutil

    import pytest

    from hadoop_common_spark.operators.aggregate import ohlc_aggregate, ohlc_merge
    from hadoop_common_spark.streaming.jobs import (
        _fold_state_batch,
        _read_state_committed,
    )

    out = str(tmp_path / "state")
    rows = spark.createDataFrame(
        [("a", 1, 10, 1, 5.0), ("a", 1, 11, 2, 7.0)],
        "g string, bkt int, sec long, id long, v double",
    )
    state = ohlc_aggregate(rows, ["g", "bkt"], "sec", "id", "v")
    merge = lambda m: ohlc_merge(m, ["g", "bkt"])
    _fold_state_batch(spark, state, out, merge, batch_id=0)
    committed = spark.read.parquet(out).collect()

    # crash window 1: out renamed away, staging committed -> promote it
    shutil.move(out, out + "__staging")
    got = _read_state_committed(spark, out)
    assert got is not None and got.collect() == committed

    # crash window 2: staging write died AFTER out moved to __old
    shutil.move(out, out + "__old")
    (tmp_path / "state__staging").mkdir()  # partial staging, no _SUCCESS
    got = _read_state_committed(spark, out)
    assert got is not None and got.collect() == committed
    shutil.rmtree(str(tmp_path / "state__staging"))

    # partial out_path itself (legacy overwrite crash): loud failure —
    # both accepted markers must be gone (the protocol's own
    # _HCS_COMMITTED and the committer's _SUCCESS)
    (tmp_path / "state" / "_SUCCESS").unlink()
    (tmp_path / "state" / "_HCS_COMMITTED").unlink()
    with pytest.raises(RuntimeError, match="commit marker"):
        _read_state_committed(spark, out)


def test_fold_state_commit_marker_independent_of_committer_conf(
    spark, tmp_path
):
    """The protocol must not depend on the committer's _SUCCESS marker:
    with mapreduce.fileoutputcommitter.marksuccessfuljobs=false (a
    common production setting) the fold writes its OWN _HCS_COMMITTED
    marker, so the second fold still reads the first's state instead of
    misdiagnosing it as a crashed partial write (ADVICE r7, medium)."""
    from hadoop_common_spark.operators.aggregate import ohlc_aggregate, ohlc_merge
    from hadoop_common_spark.streaming.jobs import _fold_state_batch

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    prev_val = hconf.get(key)
    hconf.set(key, "false")
    try:
        out = str(tmp_path / "state")
        rows = spark.createDataFrame(
            [("a", 1, 10, 1, 5.0), ("a", 1, 11, 2, 7.0)],
            "g string, bkt int, sec long, id long, v double",
        )
        state = ohlc_aggregate(rows, ["g", "bkt"], "sec", "id", "v")
        merge = lambda m: ohlc_merge(m, ["g", "bkt"])
        _fold_state_batch(spark, state, out, merge, batch_id=0)
        assert not (tmp_path / "state" / "_SUCCESS").exists()
        assert (tmp_path / "state" / "_HCS_COMMITTED").exists()
        # the second fold must read (not reject) the first fold's state
        _fold_state_batch(spark, state, out, merge, batch_id=1)
        after = spark.read.parquet(out).collect()
        assert after[0].n_events == 4
    finally:
        if prev_val is None:
            hconf.unset(key)
        else:
            hconf.set(key, prev_val)


def test_fold_state_single_writer_lease(spark, tmp_path):
    """The swap protocol is single-writer per out_path: a second fold
    entering while the lease is held must raise loudly (not interleave
    renames and promote a half-written staging dir), and the state on
    disk must be exactly what the holder committed (VERDICT r7 #6)."""
    import pytest

    from hadoop_common_spark.operators.aggregate import ohlc_aggregate, ohlc_merge
    from hadoop_common_spark.streaming.jobs import _fold_state_batch

    out = str(tmp_path / "state")
    rows = spark.createDataFrame(
        [("a", 1, 10, 1, 5.0), ("a", 1, 11, 2, 7.0)],
        "g string, bkt int, sec long, id long, v double",
    )
    state = ohlc_aggregate(rows, ["g", "bkt"], "sec", "id", "v")
    merge = lambda m: ohlc_merge(m, ["g", "bkt"])
    _fold_state_batch(spark, state, out, merge, batch_id=0)
    committed = spark.read.parquet(out).collect()

    # a concurrent maintainer holds the lease: the interleaved fold
    # must refuse, and must not touch the committed state
    (tmp_path / "state__lease").touch()
    with pytest.raises(RuntimeError, match="lease"):
        _fold_state_batch(spark, state, out, merge, batch_id=1)
    assert spark.read.parquet(out).collect() == committed
    assert not (tmp_path / "state__staging").exists()

    # lease released (or operator-cleared after a hard kill): fold runs
    (tmp_path / "state__lease").unlink()
    _fold_state_batch(spark, state, out, merge, batch_id=1)
    assert spark.read.parquet(out).collect()[0].n_events == 4
    # and the fold cleaned its own lease up
    assert not (tmp_path / "state__lease").exists()

    # a FAILING fold must release the lease too (else one bad batch
    # wedges the maintainer forever) and leave committed state intact
    def bad_merge(m):
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        _fold_state_batch(spark, state, out, bad_merge, batch_id=2)
    assert not (tmp_path / "state__lease").exists()
    assert spark.read.parquet(out).collect()[0].n_events == 4
    _fold_state_batch(spark, state, out, merge, batch_id=2)
    assert spark.read.parquet(out).collect()[0].n_events == 6

    # the lease is per-out_path: a maintainer on a DIFFERENT path folds
    # freely while this path's lease is held (no global serialization)
    (tmp_path / "state__lease").touch()
    other = str(tmp_path / "other_state")
    _fold_state_batch(spark, state, other, merge, batch_id=0)
    assert spark.read.parquet(other).collect()[0].n_events == 2
    (tmp_path / "state__lease").unlink()


def test_fold_state_legacy_guardless_state(spark, tmp_path):
    """guard_batch_ids over state written BEFORE the guard existed (no
    _bid column) must fold as pre-guard state and start stamping _bid,
    not die on an unresolved-column AnalysisException forever."""
    from hadoop_common_spark.operators.aggregate import ohlc_aggregate, ohlc_merge
    from hadoop_common_spark.streaming.jobs import _fold_state_batch

    out = str(tmp_path / "state")
    rows = spark.createDataFrame(
        [("a", 1, 10, 1, 5.0), ("a", 1, 11, 2, 7.0)],
        "g string, bkt int, sec long, id long, v double",
    )
    state = ohlc_aggregate(rows, ["g", "bkt"], "sec", "id", "v")
    merge = lambda m: ohlc_merge(m, ["g", "bkt"])
    # legacy: guardless fold leaves no _bid column
    _fold_state_batch(spark, state, out, merge, batch_id=None)
    assert "_bid" not in spark.read.parquet(out).columns
    # guarded fold over it migrates instead of raising
    _fold_state_batch(spark, state, out, merge, batch_id=3)
    after = spark.read.parquet(out).collect()
    assert after[0].n_events == 4 and after[0]._bid == 3
    # and the guard is live from here on
    _fold_state_batch(spark, state, out, merge, batch_id=3)
    assert spark.read.parquet(out).collect() == after


def test_protobuf_bridge_contract():
    """The bridge's three contractual behaviors, each in a clean
    subprocess (this process already has google.protobuf live):
    (1) with no wheel and no SDK, ensure_protobuf reports False instead
    of raising; (2) the bridge serves a google.protobuf whose
    StateMessage gencode round-trips on the wire; (3) ensure_protobuf
    exports PYTHONPATH so JVM-spawned workers inherit the bridge."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(code, env_extra):
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env.update(env_extra)
        return subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env=env, cwd=repo, timeout=120,
        )

    # (1) negative path: SDK location overridden to nowhere
    p = run(
        "from hadoop_common_spark.streaming.stateful import ensure_protobuf;"
        "print('RESULT', ensure_protobuf())",
        {"HCS_CLOUDSDK_THIRD_PARTY": "/nonexistent"},
    )
    assert "RESULT False" in p.stdout, (p.stdout, p.stderr[-500:])

    # (2)+(3) positive path: bridge activates, pb2 gencode round-trips,
    # PYTHONPATH carries the bridge dir for workers
    p = run(
        """
from hadoop_common_spark.streaming.stateful import ensure_protobuf, protobuf_bridge_dir
import os
ok = ensure_protobuf()
if not ok:
    print('RESULT skip')  # machine without wheel or SDK: nothing to test
else:
    from pyspark.sql.streaming.proto import StateMessage_pb2 as sm
    req = sm.StateRequest(version=2)
    req.statefulProcessorCall.setHandleState.state = sm.HandleState.INITIALIZED
    back = sm.StateRequest.FromString(req.SerializeToString())
    assert back.version == 2 and back.WhichOneof('method') == 'statefulProcessorCall'
    # PYTHONPATH export only required when the bridge (not a wheel) serves it
    import google.protobuf as gp
    bridged = 'protobuf_bridge' in (gp.__file__ or '') or 'cloudsdk' in (gp.__file__ or '')
    path_ok = (not bridged) or protobuf_bridge_dir() in os.environ.get('PYTHONPATH', '')
    print('RESULT', 'ok' if path_ok else 'no-pythonpath')
""",
        {},
    )
    assert "RESULT ok" in p.stdout or "RESULT skip" in p.stdout, (
        p.stdout,
        p.stderr[-500:],
    )

    # (4) lazy namespace bridging (ADVICE r7): a google.* distribution
    # added to sys.path AFTER the bridge activates must still resolve —
    # the bridge's __path__ re-scans sys.path on iteration instead of
    # snapshotting once at import time
    p = run(
        """
from hadoop_common_spark.streaming.stateful import ensure_protobuf
ok = ensure_protobuf()
if ok:
    import google
    bridged = 'protobuf_bridge' in (getattr(google, '__file__', '') or '')
if not ok or not bridged:
    print('RESULT skip')  # real wheel or no bridge: nothing to test
else:
    import os, sys, tempfile
    d = tempfile.mkdtemp()
    os.makedirs(os.path.join(d, 'google', 'hcs_late_pkg'))
    with open(os.path.join(d, 'google', 'hcs_late_pkg', '__init__.py'), 'w') as f:
        f.write('X = 42')
    sys.path.append(d)  # AFTER bridge activation
    from google.hcs_late_pkg import X
    print('RESULT', 'ok' if X == 42 else 'bad')
""",
        {},
    )
    assert "RESULT ok" in p.stdout or "RESULT skip" in p.stdout, (
        p.stdout,
        p.stderr[-500:],
    )


def test_tws_session_expiry_checkpoint_resume_timers(spark, sf_dir, tmp_path):
    """Crash-resume pin for the timer operator (VERDICT r8 #4): phase 1
    drains ONLY the real events through session_expiry_tws with a
    durable checkpoint + file sink, then the query stops — every user's
    tail session is still OPEN in the RocksDB store with a PENDING
    event-time timer (no flush batch ran, so no timer has fired). Phase
    2 restarts from the same checkpoint over two far-future flush files:
    the RESTORED timers (state-store timer column family, not anything
    re-registered by input — the sentinel user's rows never touch the
    real keys) must fire EXACTLY ONCE each. Union across both phases ==
    the oracle-backed batch twin, duplicate-free; and phase 1 alone must
    be strictly smaller (the resumed timers, not the first drain,
    produced the tail sessions). This is the preemption-tolerance
    contract of the reference's ReliabilityTest/TestBadRecords applied
    to streaming state (SURVEY §5.3): kill between micro-batches, resume,
    emit once."""
    import datetime
    import glob
    import os
    import shutil

    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.streaming.stateful import (
        session_expiry_tws,
        transform_with_state_available,
    )
    from hadoop_common_spark.tables import load_tables

    if not transform_with_state_available():
        pytest.skip("google.protobuf unavailable: TWS driver worker cannot start")

    src = str(tmp_path / "stream_src")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    ev = load_tables(spark, sf_dir)["events"].select("user_id", "event_id", "ts")
    far = ev.agg(F.max("ts").alias("m")).collect()[0].m

    def add_file(df, name, mtime):
        w = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(w)
        dst = os.path.join(src, name)
        shutil.move(glob.glob(w + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    add_file(ev, "f0.parquet", 1_000_000)
    schema = spark.read.parquet(f"{src}/f0.parquet").schema

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            session_expiry_tws(stream, gap_sec=1800)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def emitted():
        return sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(out).collect()
            if r.user_id >= 0
        )

    try:
        # phase 1: real events only — tail sessions stay open, timers pend
        drain()
        phase1 = emitted()
        # phase 2 ("resume after kill"): flush batches advance the
        # watermark; the checkpoint-restored timers must fire
        for i, yrs in ((1, 3650), (2, 7300)):
            add_file(
                spark.createDataFrame(
                    [(-1, -i, far + datetime.timedelta(days=yrs))],
                    "user_id bigint, event_id bigint, ts timestamp",
                ),
                f"f{i}.parquet",
                1_000_000 + i,
            )
        drain()
        got = emitted()
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)

    batch = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in load_all()["stream_session_expiry_batch"].fn(spark, sf_dir).collect()
    )
    # exactly-once across the restart: equality is duplicate-sensitive
    # (a timer that re-fired or a replayed batch would add rows)
    assert got == batch and len(got) > 0
    # and the tail sessions came from the RESUMED run's restored timers
    assert len(phase1) < len(got)


def test_tws_topk_checkpoint_resume_liststate(spark, sf_dir, tmp_path):
    """Checkpoint-restore pin for the ListState maintainer (the timer
    test covers ValueState+timers; this covers the list column family):
    phase 1 drains the OLD half of events with a durable checkpoint and
    stops; phase 2 restarts from the same checkpoint over only the NEW
    half. For every user the new half touches, the resumed emission
    must equal the batch top-k over ALL events — impossible unless the
    per-user k-row ListState survived the restart (a state loss would
    rank the new half alone). Distinct from the bootstrap test: no
    initial_state is passed; the ONLY carrier across the kill is the
    RocksDB checkpoint."""
    import glob
    import os
    import shutil

    from pyspark.sql import Window

    from hadoop_common_spark.streaming.stateful import (
        topk_events_tws,
        transform_with_state_available,
    )
    from hadoop_common_spark.tables import load_tables

    if not transform_with_state_available():
        pytest.skip("google.protobuf unavailable: TWS driver worker cannot start")

    ev = load_tables(spark, sf_dir)["events"].select("user_id", "event_id", "value")
    old = ev.filter(F.col("event_id") % 2 == 0)
    new = ev.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def add_file(df, name, mtime):
        w = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(w)
        dst = os.path.join(src, name)
        shutil.move(glob.glob(w + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    add_file(old, "f0.parquet", 1_000_000)
    schema = spark.read.parquet(f"{src}/f0.parquet").schema
    out = str(tmp_path / "sink")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    # memory sink refuses checkpoint recovery — a batch-id-tagged
    # foreachBatch parquet sink is the recoverable update-mode analog
    def drain():
        stream = spark.readStream.schema(schema).parquet(src)

        def write_batch(bdf, bid):
            bdf.withColumn("_bid", F.lit(bid)).write.mode("append").parquet(out)

        q = (
            topk_events_tws(stream, k=3)
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        drain()
        p1_max_bid = spark.read.parquet(out).agg(F.max("_bid")).collect()[0][0]
        add_file(new, "f1.parquet", 1_000_001)
        drain()
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)

    got = sorted(
        (r.user_id, r.event_id, r.value, r.rnk)
        for r in spark.read.parquet(out)
        .filter(F.col("_bid") > p1_max_bid)
        .collect()
    )
    touched = {u.user_id for u in new.select("user_id").distinct().collect()}
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    full = (
        ev.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )
    want = sorted(
        (r.user_id, r.event_id, r.value, r.rnk)
        for r in full.collect()
        if r.user_id in touched
    )
    assert got == want and len(got) > 0


def test_tws_distinct_types_checkpoint_resume_mapstate(spark, sf_dir, tmp_path):
    """Checkpoint-restore pin for the MapState column family — with the
    ValueState+timer and ListState pins this completes the trio: every
    state kind the three transformWithState operators use survives a
    kill between micro-batches. Phase 1 drains the old half of events
    (per-user seen-type maps populated), stops; phase 2 restarts from
    the checkpoint over the new half only. Each touched user's resumed
    distinct count must equal batch count_distinct over ALL events —
    state loss would count the new half's types alone."""
    import glob
    import os
    import shutil

    from hadoop_common_spark.streaming.stateful import (
        distinct_event_types_tws,
        transform_with_state_available,
    )
    from hadoop_common_spark.tables import load_tables

    if not transform_with_state_available():
        pytest.skip("google.protobuf unavailable: TWS driver worker cannot start")

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", "event_type"
    )
    old = ev.filter(F.col("event_id") % 2 == 0)
    new = ev.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")
    os.makedirs(src)

    def add_file(df, name, mtime):
        w = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(w)
        dst = os.path.join(src, name)
        shutil.move(glob.glob(w + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    add_file(old, "f0.parquet", 1_000_000)
    schema = spark.read.parquet(f"{src}/f0.parquet").schema

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)

        def write_batch(bdf, bid):
            bdf.withColumn("_bid", F.lit(bid)).write.mode("append").parquet(out)

        q = (
            distinct_event_types_tws(stream)
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        drain()
        p1_max_bid = spark.read.parquet(out).agg(F.max("_bid")).collect()[0][0]
        add_file(new, "f1.parquet", 1_000_001)
        drain()
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)

    got = {
        r.user_id: r.n_types
        for r in spark.read.parquet(out).filter(F.col("_bid") > p1_max_bid).collect()
    }
    want = {
        r.user_id: r.n
        for r in ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
        if r.user_id in got
    }
    touched = {u.user_id for u in new.select("user_id").distinct().collect()}
    assert set(got) == touched
    assert got == want and len(got) > 0
