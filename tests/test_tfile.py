"""TFile/BCFile container bridge tests (SURVEY §1.3 last format family).

The strongest evidence here is CROSS-parity with the real Hadoop
implementation shipped on Spark's classpath: files written by
org.apache.hadoop.io.file.tfile.TFile.Writer parse byte-exactly with our
pure-Python reader, and files written by our writer read back through
TFile.Reader — both directions, so the byte layout is the reference's,
not merely self-consistent.
"""

from __future__ import annotations

import io
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_common_spark.sources.tfile import (
    parse_tfile,
    read_tfile,
    read_vlong,
    write_tfile,
    write_vlong,
)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_vlong_roundtrip_property(n):
    buf = io.BytesIO()
    write_vlong(buf, n)
    buf.seek(0)
    assert read_vlong(buf) == n
    assert buf.read() == b""  # no trailing bytes


def test_vlong_boundary_values():
    # every encoding-length boundary from Utils.java:60-85's spec table
    bounds = [
        -32, 127, 128, -33, 20 * 256 - 1, -20 * 256, 16 * 65536 - 1,
        -16 * 65536, 8 * (1 << 24) - 1, -8 * (1 << 24), 2**31 - 1, -(2**31),
        2**39 - 1, -(2**39), 2**47 - 1, -(2**47), 2**55 - 1, -(2**55),
        2**63 - 1, -(2**63),
    ]
    for n in bounds + [b + d for b in bounds for d in (-1, 1) if abs(b + d) < 2**63]:
        buf = io.BytesIO()
        write_vlong(buf, n)
        buf.seek(0)
        assert read_vlong(buf) == n, n


def _mkrecs(n, seed=11):
    rng = random.Random(seed)
    return [
        (
            f"k{i:06d}".encode(),
            bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200))),
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("compression", ["none", "gz"])
def test_python_roundtrip(tmp_path, compression):
    recs = _mkrecs(3000)
    p = str(tmp_path / "t.tfile")
    assert write_tfile(p, recs, compression=compression, block_size=16 << 10) == 3000
    with open(p, "rb") as f:
        assert list(parse_tfile(f.read())) == recs


def test_empty_tfile_roundtrip(tmp_path):
    p = str(tmp_path / "empty.tfile")
    assert write_tfile(p, []) == 0
    with open(p, "rb") as f:
        assert list(parse_tfile(f.read())) == []


def test_jvm_writer_python_reader_parity(spark, tmp_path):
    """Hadoop TFile.Writer (gz, multi-block) -> parse_tfile byte parity."""
    jvm = spark._jvm
    conf = jvm.org.apache.hadoop.conf.Configuration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    p = str(tmp_path / "jvm.tfile")
    fout = fs.create(Path("file://" + p), True)
    w = jvm.org.apache.hadoop.io.file.tfile.TFile.Writer(
        fout, 64 * 1024, "gz", None, conf
    )
    recs = _mkrecs(2000, seed=3)
    for k, v in recs:
        w.append(bytearray(k), bytearray(v))
    w.close()
    fout.close()
    with open(p, "rb") as f:
        assert list(parse_tfile(f.read())) == recs


def test_python_writer_jvm_reader_parity(spark, tmp_path):
    """write_tfile -> Hadoop TFile.Reader scanner reads every record."""
    jvm = spark._jvm
    conf = jvm.org.apache.hadoop.conf.Configuration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    recs = _mkrecs(2000, seed=5)
    p = str(tmp_path / "py.tfile")
    write_tfile(p, recs, compression="gz", block_size=64 << 10)
    fin = fs.open(Path("file://" + p))
    flen = fs.getFileStatus(Path("file://" + p)).getLen()
    r = jvm.org.apache.hadoop.io.file.tfile.TFile.Reader(fin, flen, conf)
    assert r.getEntryCount() == 2000
    scanner = r.createScanner()
    out = []
    while not scanner.atEnd():
        # fresh writables per record: TFile.Reader.Entry.get() does not
        # truncate a reused BytesWritable for 0-length values (verified
        # on files written by the JVM writer itself), so reuse would
        # resurface the previous record's value bytes
        kw = jvm.org.apache.hadoop.io.BytesWritable()
        vw = jvm.org.apache.hadoop.io.BytesWritable()
        scanner.entry().get(kw, vw)
        out.append((bytes(kw.copyBytes()), bytes(vw.copyBytes())))
        scanner.advance()
    r.close()
    fin.close()
    assert out == recs


def test_read_tfile_dataframe_and_auto_sniff(spark, tmp_path):
    """Distributed read: several files under one dir -> one DataFrame;
    read_auto dispatches on the BCFile header magic."""
    from hadoop_common_spark.sources.readers import read_auto

    all_recs = []
    for i in range(3):
        recs = [(f"f{i}k{j}".encode(), f"v{j}".encode()) for j in range(50)]
        write_tfile(str(tmp_path / f"part-{i}.tfile"), recs, compression="gz")
        all_recs += recs
    df = read_tfile(spark, str(tmp_path))
    got = sorted((bytes(r.key), bytes(r.value)) for r in df.collect())
    assert got == sorted(all_recs)
    auto = read_auto(spark, str(tmp_path))
    assert auto.count() == 150 and set(auto.columns) == {"key", "value"}


def test_block_split_read_of_single_large_file(spark, tmp_path):
    """A single multi-block TFile above split_threshold decodes via the
    BLOCK-split plan: one task spec per BCFile data block (the reference
    reader's split unit), identical records, and a footer-only plan
    (tfile_split_plan never touches the data region)."""
    from hadoop_common_spark.sources.tfile import tfile_split_plan

    recs = _mkrecs(4000, seed=7)
    p = str(tmp_path / "big.tfile")
    write_tfile(p, recs, compression="gz", block_size=16 << 10)

    plan = tfile_split_plan(p)
    assert len(plan) > 4  # genuinely multi-block => parallel decode units
    # split_threshold=1 forces the block path for this file
    df = read_tfile(spark, p, split_threshold=1)
    got = sorted((bytes(r.key), bytes(r.value)) for r in df.collect())
    assert got == sorted(recs)

    # mixed corpus: one big (block path) + one small (per-file path)
    small = [(b"s%d" % i, b"x%d" % i) for i in range(20)]
    write_tfile(str(tmp_path / "small.tfile"), small, compression="none")
    df2 = read_tfile(spark, str(tmp_path), split_threshold=2000)
    assert df2.count() == 4020


def test_truncated_tfile_raises_eoferror(tmp_path):
    """The _read_exact contract: any truncation inside the record walk or
    footer surfaces as EOFError/ValueError, never IndexError (ADVICE r4)."""
    recs = _mkrecs(200, seed=9)
    p = str(tmp_path / "t.tfile")
    write_tfile(p, recs, compression="none", block_size=4 << 10)
    with open(p, "rb") as f:
        blob = f.read()
    for cut in (len(blob) - 1, len(blob) // 2, 40):
        with pytest.raises((EOFError, ValueError)):
            list(parse_tfile(blob[:cut]))


def test_sorted_write_and_seek(tmp_path):
    """sorted_keys=True records the memcmp comparator; tfile_seek touches
    one block and resolves hits, misses-between-keys, and out-of-range
    probes; unsorted files refuse to seek (reference behavior)."""
    from hadoop_common_spark.sources.tfile import tfile_seek

    recs = [(f"k{i:06d}".encode(), f"v{i}".encode()) for i in range(0, 5000, 2)]
    p = str(tmp_path / "sorted.tfile")
    write_tfile(p, recs, compression="gz", block_size=8 << 10, sorted_keys=True)
    with open(p, "rb") as f:
        blob = f.read()
    assert tfile_seek(blob, b"k000000") == b"v0"
    assert tfile_seek(blob, b"k002468") == b"v2468"
    assert tfile_seek(blob, b"k004998") == b"v4998"
    assert tfile_seek(blob, b"k000001") is None  # between keys
    assert tfile_seek(blob, b"k999999") is None  # past the end
    assert tfile_seek(blob, b"") is None  # before the start

    # order violation rejected
    with pytest.raises(ValueError, match="sorted_keys"):
        write_tfile(str(tmp_path / "bad.tfile"), [(b"b", b""), (b"a", b"")], sorted_keys=True)

    # unsorted file refuses to seek
    pu = str(tmp_path / "uns.tfile")
    write_tfile(pu, [(b"b", b"1"), (b"a", b"2")])
    with open(pu, "rb") as f:
        with pytest.raises(ValueError, match="unsorted"):
            tfile_seek(f.read(), b"a")


def test_sorted_tfile_jvm_seek_parity(spark, tmp_path):
    """A sorted file from write_tfile must satisfy the JVM reader's
    key-seek API too (createScannerByKey on the memcmp comparator)."""
    jvm = spark._jvm
    conf = jvm.org.apache.hadoop.conf.Configuration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    recs = [(f"k{i:04d}".encode(), f"v{i}".encode()) for i in range(0, 1000, 2)]
    p = str(tmp_path / "sorted.tfile")
    write_tfile(p, recs, compression="gz", block_size=4 << 10, sorted_keys=True)
    fin = fs.open(Path("file://" + p))
    flen = fs.getFileStatus(Path("file://" + p)).getLen()
    r = jvm.org.apache.hadoop.io.file.tfile.TFile.Reader(fin, flen, conf)
    # exact-key seek
    s = r.createScannerByKey(bytearray(b"k0500"), None)
    kw = jvm.org.apache.hadoop.io.BytesWritable()
    vw = jvm.org.apache.hadoop.io.BytesWritable()
    s.entry().get(kw, vw)
    assert bytes(kw.copyBytes()) == b"k0500" and bytes(vw.copyBytes()) == b"v500"
    # between-keys seek lands on the next greater key
    s2 = r.createScannerByKey(bytearray(b"k0501"), None)
    kw2 = jvm.org.apache.hadoop.io.BytesWritable()
    vw2 = jvm.org.apache.hadoop.io.BytesWritable()
    s2.entry().get(kw2, vw2)
    assert bytes(kw2.copyBytes()) == b"k0502" and bytes(vw2.copyBytes()) == b"v502"
    # and our own seek agrees with the JVM's on the same file
    from hadoop_common_spark.sources.tfile import tfile_seek

    with open(p, "rb") as f:
        blob = f.read()
    assert tfile_seek(blob, b"k0500") == b"v500"
    assert tfile_seek(blob, b"k0501") is None
    r.close()
    fin.close()
