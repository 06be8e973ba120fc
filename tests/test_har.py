"""HAR (Hadoop Archive) bridge tests: our version-3 writer must satisfy
the JVM's own HarFileSystem (har:// scheme) — listing, nested dirs, and
byte-exact ranged reads — and our reader round-trips."""

from __future__ import annotations

import pytest

from hadoop_common_spark.sources.har import (
    har_list,
    har_open,
    read_har_df,
    write_har,
)

FILES = [
    ("readme.txt", b"hello archive"),
    ("data/a.bin", bytes(range(256)) * 4),
    ("data/b.txt", b"second file, same dir"),
    ("data/nested/deep.txt", b"three levels down"),
    ("with space.txt", b"encoded name"),
]


def test_python_roundtrip(tmp_path):
    d = str(tmp_path / "t.har")
    assert write_har(d, FILES) == len(FILES)
    assert har_list(d) == sorted("/" + p for p, _ in FILES)
    for p, payload in FILES:
        assert har_open(d, p) == payload
    with pytest.raises(FileNotFoundError):
        har_open(d, "missing.txt")


def test_jvm_harfilesystem_reads_our_archive(spark, tmp_path):
    """har://file-<abs>.har through org.apache.hadoop.fs.HarFileSystem:
    recursive listing matches, payload bytes identical."""
    jvm = spark._jvm
    conf = jvm.org.apache.hadoop.conf.Configuration()
    d = str(tmp_path / "t.har")
    write_har(d, FILES)

    # no-authority form: har:///abs/path.har resolves the underlying FS
    # from fs.defaultFS (file:/// in a bare Configuration)
    root = jvm.org.apache.hadoop.fs.Path(f"har://{d}")
    fs = root.getFileSystem(conf)

    def walk(p):
        out = []
        for st in fs.listStatus(p):
            if st.isDirectory():
                out += walk(st.getPath())
            else:
                out.append(st.getPath())
        return out

    paths = walk(root)
    rel = sorted(p.toUri().getPath().split(".har", 1)[1] for p in paths)
    assert rel == sorted("/" + p for p, _ in FILES)

    by_rel = {"/" + p: b for p, b in FILES}
    for p in paths:
        r = p.toUri().getPath().split(".har", 1)[1]
        stream = fs.open(p)
        n = by_rel[r]
        buf = bytearray()
        while True:
            b = stream.read()
            if b < 0:
                break
            buf.append(b)
        stream.close()
        assert bytes(buf) == n, r
    fs.close()


def test_dataframe_lift(spark, tmp_path):
    d = str(tmp_path / "t.har")
    write_har(d, FILES)
    df = read_har_df(spark, d)
    got = {r.path: bytes(r.content) for r in df.collect()}
    assert got == {"/" + p: b for p, b in FILES}


def test_auto_sniff_and_cli(spark, tmp_path, capsys):
    from hadoop_common_spark.cli import main
    from hadoop_common_spark.sources.readers import read_auto

    d = str(tmp_path / "t.har")
    write_har(d, FILES)
    auto = read_auto(spark, d)
    assert auto.count() == len(FILES) and set(auto.columns) == {"path", "content"}
    assert main(["har", d]) == 0
    assert capsys.readouterr().out.splitlines() == sorted("/" + p for p, _ in FILES)
    assert main(["har", d, "--cat", "readme.txt"]) == 0
