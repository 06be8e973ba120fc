"""Round-6 continuation additions: DSIR importance weights, inverted
index, weighted sampling without replacement, windowed PMI.

Each query already has a DuckDB oracle (the driver's hard gate); these
tests add an INDEPENDENT pure-Python third implementation over the same
parquet, so a bug shared by the Spark and SQL renderings of the same
mistake still gets caught."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

_DSIR_B = 4096


def _toks(text: str) -> list[str]:
    t = text.strip().lower()
    return [x for x in re.split(r"\s+", t) if x != ""] if t else []


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def test_dsir_scores_match_python(spark, docs_pdf):
    from hadoop_common_spark.queries import load_all

    reg = load_all()
    got = [tuple(r) for r in reg["corpus_dsir_weights"].fn(spark, SF_DIR).collect()]

    feats = []  # (doc_id, is_target, bucket)
    for r in docs_pdf.itertuples(index=False):
        ts = _toks(r.text)
        if not ts:
            continue
        is_t = (r.lang == "en") and (r.n_chars >= 300)
        gs = ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        feats.extend((r.doc_id, is_t, _h60(g) % _DSIR_B) for g in gs)
    c_r: Counter = Counter(b for _, _, b in feats)
    c_t: Counter = Counter(b for _, t, b in feats if t)
    r_tot, t_tot = sum(c_r.values()), sum(c_t.values())
    wm = {
        b: math.floor(
            (
                math.log((c_t.get(b, 0) + 1.0) / (t_tot + float(_DSIR_B)))
                - math.log((c_r[b] + 1.0) / (r_tot + float(_DSIR_B)))
            )
            * 1e6
        )
        for b in c_r
    }
    score: dict = defaultdict(int)
    nf: dict = defaultdict(int)
    for d, _, b in feats:
        score[d] += wm[b]
        nf[d] += 1
    want = sorted(
        ((d, nf[d], score[d]) for d in score), key=lambda x: (-x[2], x[0])
    )[:100]
    assert got == want


def test_inverted_index_matches_python(spark, docs_pdf):
    from hadoop_common_spark.queries import load_all

    reg = load_all()
    got = [tuple(r) for r in reg["text_inverted_index"].fn(spark, SF_DIR).collect()]

    tf: Counter = Counter()
    for r in docs_pdf.itertuples(index=False):
        for t in _toks(r.text):
            tf[(t, r.doc_id)] += 1
    by_term: dict = defaultdict(list)
    for (t, d), c in tf.items():
        by_term[t].append((d, c))
    want = []
    for t, posts in by_term.items():
        posts.sort()
        want.append(
            (
                t,
                len(posts),
                sum(c for _, c in posts),
                ",".join(str(d) for d, _ in posts[:5]),
            )
        )
    want.sort(key=lambda x: (-x[1], x[0]))
    assert got == want[:100]


def test_pmi_pairs_match_python(spark, docs_pdf):
    from hadoop_common_spark.queries import load_all

    reg = load_all()
    got = [tuple(r) for r in reg["text_pmi_pairs"].fn(spark, SF_DIR).collect()]

    uni: Counter = Counter()
    pc: Counter = Counter()
    n_pairs = 0
    for r in docs_pdf.itertuples(index=False):
        ts = _toks(r.text)
        uni.update(ts)
        for d in (1, 2, 3):
            for a, b in zip(ts, ts[d:]):
                pc[(min(a, b), max(a, b))] += 1
                n_pairs += 1
    want = []
    for (a, b), c_ab in pc.items():
        if c_ab >= 5:
            pmi = (float(n_pairs) * float(c_ab)) / (float(uni[a]) * float(uni[b]))
            want.append((a, b, c_ab, uni[a], uni[b], pmi))
    want.sort(key=lambda x: (-x[5], x[0], x[1]))
    want = want[:100]
    assert [g[:5] for g in got] == [w[:5] for w in want]
    for g, w in zip(got, want):
        assert g[5] == pytest.approx(w[5], rel=1e-12)


def test_weighted_sample_matches_python(spark):
    from hadoop_common_spark.operators.sort import top_k, weighted_sample_keys

    rows = [(i, (i % 17) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    keyed = df.select(
        "doc_id",
        "weight",
        weighted_sample_keys(F.col("weight"), F.col("doc_id")).alias("_k"),
    )
    got = [
        (r.doc_id, r.weight)
        for r in top_k(keyed, 100, [F.col("_k").desc(), F.col("doc_id").asc()]).collect()
    ]

    def key(i, w):
        u = (_h60(f"ws:{i}") + 1.0) / float(1 << 60)
        return math.log(u) / w

    want = sorted(rows, key=lambda r: (-key(r[0], r[1]), r[0]))[:100]
    assert got == want


def test_weighted_sample_heavier_is_likelier(spark):
    """Sanity on A-ES semantics: with weights 1 vs 100 split half/half,
    the heavy half must dominate a k=100 sample out of 2000 rows."""
    from hadoop_common_spark.operators.sort import top_k, weighted_sample_keys

    rows = [(i, 100 if i < 1000 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    keyed = df.select(
        "doc_id", weighted_sample_keys(F.col("weight"), F.col("doc_id")).alias("_k")
    )
    sel = [r.doc_id for r in top_k(keyed, 100, [F.col("_k").desc()]).collect()]
    n_heavy = sum(1 for d in sel if d < 1000)
    assert n_heavy >= 90


def test_cooccurrence_pairs_exact(spark):
    from hadoop_common_spark.operators.textstats import cooccurrence_pairs

    cases = [
        [],
        ["one"],
        ["a", "b"],
        ["b", "a", "b", "a"],
        ["w1", "w2", "w3", "w4", "w5", "w6"],
        ["x"] * 5,
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, t array<string>")
    out = df.select("i", cooccurrence_pairs(F.col("t"), 3).alias("p")).collect()
    got = {r.i: sorted((p.a, p.b) for p in r.p) for r in out}
    for i, ts in enumerate(cases):
        want = []
        for d in (1, 2, 3):
            for a, b in zip(ts, ts[d:]):
                want.append((min(a, b), max(a, b)))
        assert got[i] == sorted(want), f"case {i}"


def test_cooccurrence_pair_rows_matches_column_form(spark):
    """The row-form pair generator (double explode + post-Generate
    indexing, the codegen fast path text_pmi_pairs uses) must emit
    exactly the column form's pair MULTISET — including empty/1-token
    docs (no rows), repeated tokens (multiplicity preserved), and
    windows clipped at the array end."""
    from hadoop_common_spark.operators.textstats import (
        cooccurrence_pair_rows,
        cooccurrence_pairs,
    )

    cases = [
        [],
        ["one"],
        ["a", "b"],
        ["b", "a", "b", "a"],
        ["w1", "w2", "w3", "w4", "w5", "w6"],
        ["x"] * 5,
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, t array<string>"
    )
    col_form = sorted(
        (p.a, p.b)
        for r in df.select(cooccurrence_pairs(F.col("t"), 3).alias("p")).collect()
        for p in r.p
    )
    row_form = sorted(
        (r.tok_a, r.tok_b)
        for r in cooccurrence_pair_rows(df, F.col("t"), 3).collect()
    )
    assert row_form == col_form


def test_market_basket_matches_python(spark):
    from itertools import combinations

    from hadoop_common_spark.queries import load_all

    reg = load_all()
    got = [tuple(r) for r in reg["orders_market_basket"].fn(spark, SF_DIR).collect()]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    baskets = li.drop_duplicates().groupby("l_orderkey")["l_partkey"].apply(list)
    n_orders = len(baskets)
    item: Counter = Counter()
    pc: Counter = Counter()
    for parts in baskets:
        item.update(set(parts))
        for a, b in combinations(sorted(set(parts)), 2):
            pc[(a, b)] += 1
    want = []
    for (a, b), c_ab in pc.items():
        if c_ab >= 2:
            lift = (float(n_orders) * float(c_ab)) / (float(item[a]) * float(item[b]))
            want.append((a, b, c_ab, item[a], item[b], lift))
    want.sort(key=lambda x: (-x[5], x[0], x[1]))
    want = want[:100]
    assert [g[:5] for g in got] == [w[:5] for w in want]
    for g, w in zip(got, want):
        assert g[5] == pytest.approx(w[5], rel=1e-12)


def test_user_ewma_matches_python(spark):
    from hadoop_common_spark.queries import load_all

    reg = load_all()
    got = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in reg["events_user_ewma"].fn(spark, SF_DIR).collect()
    }

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    want = {}
    for uid, g in ev.groupby("user_id"):
        vals = list(g.sort_values(["ts", "event_id"])["value"])
        acc = float(vals[0])
        for x in vals[1:]:
            acc = acc * 0.75 + float(x) * 0.25
        want[uid] = (len(vals), acc)
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0]
        # Python floats are IEEE doubles with the same fold order ->
        # exact equality is the claim, not approx
        assert got[uid][1] == want[uid][1], uid


def test_rfm_segments_match_python(spark):
    from decimal import Decimal

    from hadoop_common_spark.queries import load_all

    reg = load_all()
    got = {
        (r.r_score, r.f_score, r.m_score): (r.n_customers, r.segment_revenue)
        for r in reg["customers_rfm_segments"].fn(spark, SF_DIR).collect()
    }

    od = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = {}
    for r in od.itertuples(index=False):
        last, freq, mon = cust.get(r.o_custkey, (None, 0, Decimal(0)))
        ts = r.o_orderdate.timestamp()
        cust[r.o_custkey] = (
            ts if last is None else max(last, ts),
            freq + 1,
            mon + Decimal(f"{r.o_totalprice:.6f}"),
        )
    n = len(cust)

    def ranks(key):
        order = sorted(cust, key=key)
        return {ck: i + 1 for i, ck in enumerate(order)}

    pr = ranks(lambda c: (-cust[c][0], c))
    pf = ranks(lambda c: (-cust[c][1], c))
    pm = ranks(lambda c: (-float(cust[c][2]), c))
    want: dict = {}
    for c in cust:
        seg = tuple((p[c] - 1) * 5 // n + 1 for p in (pr, pf, pm))
        cnt, rev = want.get(seg, (0, Decimal(0)))
        want[seg] = (cnt + 1, rev + cust[c][2])
    assert set(got) == set(want)
    for seg, (cnt, rev) in want.items():
        assert got[seg][0] == cnt
        assert got[seg][1] == pytest.approx(float(rev), rel=1e-12)


def test_knn_label_eval_matches_python(spark):
    import numpy as np

    from hadoop_common_spark.queries import load_all

    reg = load_all()
    got = {
        r.vec_id: (r.true_label, r.pred_label, r.correct)
        for r in reg["similarity_knn_label_eval"].fn(spark, SF_DIR).collect()
    }

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples(index=False)}
    labels = {r.vec_id: r.label for r in emb.itertuples(index=False)}
    probes = sorted(v for v in vecs if v < 50)
    train = sorted(v for v in vecs if v >= 50)
    for q in probes:
        d = sorted(
            (float(((vecs[q] - vecs[t]) ** 2).sum()), t) for t in train
        )
        top = [labels[t] for _, t in d[:5]]
        votes = Counter(top)
        best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        assert got[q][0] == labels[q]
        assert got[q][1] == best, q
        assert got[q][2] == int(best == labels[q])


def test_unicode_tokenization_boundary_documented(spark):
    """Cross-engine unicode boundary pin (r6 probe): on ASCII input the
    Spark and DuckDB tokenizations are byte-identical (the whole oracle
    gate rests on this); on unicode input two KNOWN divergences exist —
    DuckDB trim() strips U+2009 (thin space) where Spark's trim is
    ASCII-only, and lower('İ') is 'i̇' (i + combining dot) on the JVM
    but 'i' in DuckDB. This test pins today's behavior on BOTH engines
    so an engine upgrade that moves the boundary fails loudly here
    instead of corrupting an oracle comparison; production corpora
    should NFC-normalize + strip exotic whitespace before the text tier
    (the documented cleaning pre-pass)."""
    import duckdb
    from pyspark.sql import functions as F

    # ASCII: identical (the gate's foundation)
    ascii_text = "  Hello\tWORLD  x  "
    s = spark.createDataFrame([(ascii_text,)], "text string").select(
        F.filter(F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != "").alias("t")
    ).collect()[0].t
    d = duckdb.sql(
        "SELECT list_filter(string_split_regex(lower(trim(?)), '\\s+'), x -> x <> '')",
        params=[ascii_text],
    ).fetchone()[0]
    assert list(s) == list(d) == ["hello", "world", "x"]

    # divergence 1: thin-space trim
    assert spark.createDataFrame([(" x",)], "t string").select(
        F.trim("t").alias("o")
    ).collect()[0].o == " x"
    assert duckdb.sql("SELECT trim(' x')").fetchone()[0] == "x"

    # divergence 2: Turkish dotted capital I lowercasing
    assert spark.createDataFrame([("İ",)], "t string").select(
        F.lower("t").alias("o")
    ).collect()[0].o == "i̇"
    assert duckdb.sql("SELECT lower('İ')").fetchone()[0] == "i"


def test_key_skew_report_matches_python(spark):
    from hadoop_common_spark.queries import load_all

    reg = load_all()
    row = reg["events_key_skew_report"].fn(spark, SF_DIR).collect()[0]

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    kc = Counter(ev["user_id"])
    counts = sorted(((c, u) for u, c in kc.items()), key=lambda x: (-x[0], x[1]))
    n_rows = sum(kc.values())
    assert row.n_keys == len(kc)
    assert row.n_rows == n_rows
    assert row.max_c == counts[0][0]
    assert row.top1_share == counts[0][0] / n_rows
    assert row.top10_share == sum(c for c, _ in counts[:10]) / n_rows


def test_fk_integrity_zero_orphans_and_detects_injected(spark, tmp_path):
    """The shipped testdata must be referentially clean (7 edges, zero
    orphans) AND the audit must actually detect breakage: copy the SF
    dir, drop half of nation, re-run, and the customer/supplier edges
    must light up."""
    import shutil

    from hadoop_common_spark.queries import load_all

    reg = load_all()
    clean = {
        r.fk: r.n_orphans for r in reg["tpch_fk_integrity"].fn(spark, SF_DIR).collect()
    }
    assert set(clean.values()) == {0}, clean

    broken_dir = tmp_path / "broken"
    broken_dir.mkdir()
    for f in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        shutil.copy(f"{SF_DIR}/{f}.parquet", broken_dir / f"{f}.parquet")
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    nat[nat.n_nationkey < 12].to_parquet(broken_dir / "nation.parquet")
    broken = {
        r.fk: r.n_orphans
        for r in reg["tpch_fk_integrity"].fn(spark, str(broken_dir)).collect()
    }
    assert broken["customer.c_nationkey"] > 0
    assert broken["supplier.s_nationkey"] > 0
    assert broken["lineitem.l_orderkey"] == 0
