"""Property/randomized tests for the spec-string DSLs — the reference's
own test style (TestKeyFieldHelper, TestFieldSelection use randomized
inputs against an in-process reference computation)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_common_spark.operators.fieldsel import FieldSpec, field_select, parse_spec
from hadoop_common_spark.operators.keyspec import KeySpec, keyspec_sort

# ---------------------------------------------------------------------------
# Parser-level properties (no Spark — runs hundreds of examples)
# ---------------------------------------------------------------------------

range_part = st.one_of(
    st.integers(0, 20).map(str),                                   # "4"
    st.tuples(st.integers(0, 9), st.integers(0, 20)).map(lambda t: f"{t[0]}-{t[1]}"),
    st.integers(0, 9).map(lambda i: f"{i}-"),                      # open range
)


@given(st.lists(range_part, min_size=0, max_size=6))
def test_fieldspec_parse_structure(parts):
    spec = ",".join(parts)
    fs = FieldSpec.parse(spec)
    assert len(fs.ranges) == len(parts)
    for (lo, hi), part in zip(fs.ranges, parts):
        if part.endswith("-"):
            assert hi is None and lo == int(part[:-1])
        elif "-" in part:
            a, b = part.split("-")
            assert (lo, hi) == (int(a), int(b))
        else:
            assert lo == hi == int(part)


@given(st.lists(range_part, min_size=1, max_size=4), st.lists(range_part, max_size=4))
def test_parse_spec_splits_key_value(kparts, vparts):
    k, v = parse_spec(",".join(kparts) + ":" + ",".join(vparts))
    assert len(k.ranges) == len(kparts)
    assert len(v.ranges) == len(vparts)


@given(
    st.integers(1, 9),
    st.one_of(st.none(), st.integers(1, 9)),
    st.sampled_from(["", "n", "r", "nr", "rn"]),
)
def test_keyspec_parse(f1, f2, flags):
    spec = f"-k{f1}" + (f",{f2}" if f2 else "") + flags
    ks = KeySpec.parse(spec)
    assert ks.start_field == f1
    assert ks.end_field == f2
    assert ks.numeric == ("n" in flags)
    assert ks.reverse == ("r" in flags)


# ---------------------------------------------------------------------------
# Semantics vs pure-Python reference, one Spark job over a random batch
# ---------------------------------------------------------------------------


def _py_field_select(line: str, spec: str, sep: str = "\t") -> tuple[str, str]:
    """Reference semantics of FieldSelectionHelper: select ranges, re-join."""
    fields = line.split(sep)

    def side(s: FieldSpec) -> str:
        out = []
        for lo, hi in s.ranges:
            if hi is None:
                out.extend(fields[lo:])
            else:
                out.extend(fields[lo : hi + 1])
        return sep.join(out)

    k, v = parse_spec(spec)
    return side(k), side(v)


def test_field_select_matches_python_reference(spark):
    rng = random.Random(7)
    lines = [
        "\t".join(f"f{rng.randrange(100)}" for _ in range(rng.randrange(8, 14)))
        for _ in range(200)
    ]
    for spec in ["4,3,0,1:6,5,1-3,7-", "0:1-", "2-4,0:", "1:0"]:
        df = spark.createDataFrame([(ln,) for ln in lines], ["line"])
        got = [
            (r.key, r.value)
            for r in field_select(df, "line", spec).orderBy("line").collect()
        ]
        want = [_py_field_select(ln, spec) for ln in sorted(lines)]
        assert got == want, spec


def test_keyspec_sort_matches_python_sorted(spark):
    rng = random.Random(13)
    lines = list(
        {
            f"{rng.randrange(50)}\t{rng.choice('abcdef')}\t{rng.uniform(-5, 5):.3f}"
            for _ in range(300)
        }
    )
    df = spark.createDataFrame([(ln,) for ln in lines], ["line"])

    # -k3,3nr (numeric desc on field 3) then -k2,2 (text asc on field 2)
    got = [r.line for r in keyspec_sort(df, "line", ["-k3,3nr", "-k2,2"]).collect()]
    want = sorted(lines, key=lambda ln: (-float(ln.split("\t")[2]), ln.split("\t")[1]))
    assert got == want


settings.register_profile("ci", max_examples=50, deadline=None)
settings.load_profile("ci")


# ---- typed-bytes wire-format round trip (ST/typedbytes parity) ----------

_tb_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False),  # NaN != NaN breaks equality, not codec
    st.text(max_size=40),
    st.binary(max_size=40),
)
_tb_value = st.recursive(
    _tb_scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)


@given(st.lists(_tb_value, max_size=8))
@settings(max_examples=200, deadline=None)
def test_typed_bytes_roundtrip(values):
    """tb_decode(tb_encode(v)) == v for every encodable value tree —
    the binary framing must never mangle tabs, newlines, NULs, unicode,
    nested vectors, or maps (exactly what the text framing cannot
    promise). Tuples come back as lists (both encode as VECTOR)."""
    import io

    from hadoop_common_spark.operators.typedbytes import tb_decode, tb_encode

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

    def norm(v):
        if isinstance(v, tuple):
            return [norm(x) for x in v]
        if isinstance(v, list):
            return [norm(x) for x in v]
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        if isinstance(v, bytearray):
            return bytes(v)
        return v

    assert [norm(g) for g in got] == [norm(v) for v in values]


# ---- as-of join vs pandas merge_asof (authoritative semantics) ----------

_asof_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=12
)


@given(_asof_rows, _asof_rows, st.sampled_from(["backward", "forward"]),
       st.one_of(st.none(), st.integers(1, 10)))
@settings(max_examples=25, deadline=None)
def test_asof_join_matches_pandas_merge_asof(lrows, rrows, direction, tol):
    """asof_join == pd.merge_asof on random keyed event tables (unique
    (k,t) on the right so the tie-break is immaterial), across both
    directions and tolerances — the operator's contract IS merge_asof
    (operators/joins.py docstring)."""
    import pandas as pd

    from hadoop_common_spark.operators.joins import asof_join
    from hadoop_common_spark.session import get_spark

    spark = get_spark("hcs-tests", shuffle_partitions=8)
    rrows = list({(k, t) for k, t in rrows})  # unique right (k, t)
    left = spark.createDataFrame(lrows, ["k", "t"])
    right = spark.createDataFrame(
        [(k, t, float(k * 1000 + t)) for k, t in rrows], ["k", "t", "val"]
    )
    got = {
        (r.k, r.t): r.val_asof
        for r in asof_join(
            left, right, "k", "t", "t", ["val"], direction=direction, tolerance=tol
        ).collect()
    }

    lp = pd.DataFrame(lrows, columns=["k", "t"]).sort_values("t").reset_index(drop=True)
    rp = (
        pd.DataFrame([(k, t, float(k * 1000 + t)) for k, t in rrows], columns=["k", "t", "val"])
        .sort_values("t")
        .reset_index(drop=True)
    )
    mp = pd.merge_asof(lp, rp, on="t", by="k", direction=direction, tolerance=tol)
    want = {}
    for _, row in mp.iterrows():
        v = row["val"]
        want[(int(row["k"]), int(row["t"]))] = None if pd.isna(v) else float(v)
    assert got == want
