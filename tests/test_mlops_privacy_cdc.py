"""Round-6 batch: k-means Lloyd step, hashed linear quality scorer,
k-anonymity audit, CDC merge.

Each query has a DuckDB oracle (the driver's hard gate); these tests add
an INDEPENDENT pure-Python third implementation over the same parquet,
plus the CDC fold-equivalence / idempotence contracts and the plan
shapes the scale story depends on."""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def emb_pdf():
    return pd.read_parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def events_pdf():
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _run(spark, name):
    from hadoop_common_spark.queries import load_all

    return load_all()[name].fn(spark, SF_DIR)


# ---------------------------------------------------------------- kmeans


def _sqdist(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        acc = acc + d * d  # same fold order as the zip_with/aggregate form
    return acc


def test_kmeans_step_matches_python(spark, emb_pdf):
    got = {
        r["cluster_id"]: (r["n_members"], r["inertia_micro"], r["centroid_norm2"])
        for r in _run(spark, "embedding_kmeans_step").collect()
    }

    seeds = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb_pdf.itertuples(index=False)
        if r.vec_id < 8
    }
    n: dict[int, int] = {}
    inertia: dict[int, int] = {}
    sums: dict[tuple[int, int], int] = {}
    for r in emb_pdf.itertuples(index=False):
        vec = [float(x) for x in r.embedding]
        d, cid = min((_sqdist(vec, seeds[c]), c) for c in sorted(seeds))
        n[cid] = n.get(cid, 0) + 1
        inertia[cid] = inertia.get(cid, 0) + math.floor(d * 1000000.0)
        for i, x in enumerate(vec):
            k = (cid, i)
            sums[k] = sums.get(k, 0) + math.floor(x * 1000000.0)
    want = {}
    for cid in n:
        norm2 = 0
        for (c, _i), sm in sums.items():
            if c == cid:
                m = math.floor(float(sm) / float(n[cid]))
                norm2 += m * m
        want[cid] = (n[cid], inertia[cid], norm2)
    assert got == want
    assert sum(v[0] for v in got.values()) == len(emb_pdf)


def test_kmeans_step_plan_has_no_window(spark):
    """Argmin is an array_min over the broadcast seed array — no
    row_number window, so assignment stays map-side."""
    plan = _run(spark, "embedding_kmeans_step")._jdf.queryExecution().toString()
    assert "Window" not in plan


# ---------------------------------------------------- linear quality score

_QLIN_B = 4096


def _qlin_w(tok: str) -> int:
    b = _h60(tok) % _QLIN_B
    return _h60(f"qlw:{b}") % 2001 - 1000


_ASCII_WS = "[ \t\n\r\x0b\x0c]+"  # Java/RE2 \s is ASCII-only — Python's
# unicode-aware \s/strip would diverge on U+00A0 etc. (the pinned
# cross-engine tokenization boundary); engine trim() strips SPACES only


def test_quality_linear_score_matches_python(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["lin_score"], r["quality_pass"])
        for r in _run(spark, "text_quality_linear_score").collect()
    }
    want = {}
    for r in docs.itertuples(index=False):
        stripped = r.text.strip(" ")  # engine trim(): spaces only
        if not stripped:
            continue
        toks = [x for x in re.split(_ASCII_WS, stripped.lower()) if x != ""]
        score = sum(_qlin_w(x) for x in toks)
        want[r.doc_id] = (len(toks), score, int(score >= 0))
    assert got == want


def test_quality_linear_score_plan_is_shuffle_free(spark):
    """The hashing trick means NO vocabulary join and no aggregation —
    the whole model is one projected scan. A shuffle appearing here
    would mean the scorer stopped being the cheap first pass."""
    plan = _run(spark, "text_quality_linear_score")._jdf.queryExecution().toString()
    physical = plan.split("== Physical Plan ==")[1]
    assert "Exchange" not in physical
    assert "BatchEvalPython" not in physical


# ------------------------------------------------------------ k-anonymity


def test_k_anonymity_matches_python(spark, events_pdf):
    got = {
        r["event_type"]: (
            r["n_rows"],
            r["n_qi_groups"],
            r["n_violating_groups"],
            r["n_suppressed_rows"],
        )
        for r in _run(spark, "events_k_anonymity").collect()
    }
    groups: dict[tuple, int] = {}
    for r in events_pdf.itertuples(index=False):
        epoch = r.ts.value // 1_000_000_000
        qi = (r.event_type, (epoch % 86400) // 3600, math.floor(r.value / 50.0))
        groups[qi] = groups.get(qi, 0) + 1
    want: dict[str, list[int]] = {}
    for (et, _h, _b), cnt in groups.items():
        w = want.setdefault(et, [0, 0, 0, 0])
        w[0] += cnt
        w[1] += 1
        if cnt < 5:
            w[2] += 1
            w[3] += cnt
    assert got == {k: tuple(v) for k, v in want.items()}


def test_k_anonymity_suppression_only_counts_small_groups(spark):
    rows = _run(spark, "events_k_anonymity").collect()
    for r in rows:
        assert r["n_suppressed_rows"] <= r["n_rows"]
        assert r["n_violating_groups"] <= r["n_qi_groups"]
        # every violating group has <= 4 rows
        assert r["n_suppressed_rows"] <= 4 * r["n_violating_groups"]


# ---------------------------------------------------------------- CDC


def _ops_df(spark):
    from hadoop_common_spark.tables import register_views

    register_views(spark, SF_DIR)
    return spark.table("events").select(
        "user_id",
        F.col("ts").cast("long").alias("seq_ts"),
        "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        "value",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cdc_fold_equivalence(spark):
    """merge(materialize(prefix), suffix) == materialize(whole log) —
    the contract that makes incremental snapshot maintenance safe."""
    from hadoop_common_spark.operators.cdc import cdc_merge, materialize_log

    ops = _ops_df(spark)
    split = F.unix_timestamp(F.lit("2024-01-10 00:00:00")).cast("long")
    args = dict(key="user_id", seq_cols=("seq_ts", "event_id"), payload_cols=("value",))
    snap = materialize_log(ops.filter(F.col("seq_ts") < split), **args)
    merged = cdc_merge(snap, ops.filter(F.col("seq_ts") >= split), **args)
    whole = materialize_log(ops, **args)
    assert _rows(merged) == _rows(whole)


def test_cdc_redelivery_is_idempotent(spark):
    """Re-applying the same batch is a no-op (exactly-once by merge)."""
    from hadoop_common_spark.operators.cdc import cdc_merge, materialize_log

    ops = _ops_df(spark)
    split = F.unix_timestamp(F.lit("2024-01-15 00:00:00")).cast("long")
    args = dict(key="user_id", seq_cols=("seq_ts", "event_id"), payload_cols=("value",))
    snap = materialize_log(ops.filter(F.col("seq_ts") < split), **args)
    batch = ops.filter(F.col("seq_ts") >= split)
    once = cdc_merge(snap, batch, **args)
    twice = cdc_merge(once, batch, **args)
    assert _rows(once) == _rows(twice)


def test_cdc_merge_semantics_small(spark):
    from hadoop_common_spark.operators.cdc import cdc_merge

    snap = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 200.0), (3, 10, 300.0), (6, 10, 600.0)],
        "k long, seq_ts long, value double",
    )
    # k=1 updated (latest of two ops wins), k=2 deleted, k=4 inserted,
    # k=5 delete-of-absent (no-op, no resurrection), k=3 untouched,
    # k=6 updated TO NULL (the update must write the NULL — a coalesce
    # would silently keep the stale 600.0)
    changes = spark.createDataFrame(
        [
            (1, 20, "U", 111.0),
            (1, 21, "U", 112.0),
            (2, 20, "D", None),
            (4, 20, "I", 400.0),
            (5, 20, "D", None),
            (6, 20, "U", None),
        ],
        "k long, seq_ts long, op string, value double",
    )
    got = _rows(
        cdc_merge(snap, changes, "k", ("seq_ts",), payload_cols=("value",))
    )
    assert got == [(1, 21, 112.0), (3, 10, 300.0), (4, 20, 400.0), (6, 20, None)]


def test_cdc_latest_ops_uses_aggregate_not_window(spark):
    """The per-key latest op must stay a partial-aggregated struct-max
    (the scalable secondary-sort-keep-last), never a window sort."""
    from hadoop_common_spark.operators.cdc import latest_ops

    ops = _ops_df(spark)
    df = latest_ops(ops, "user_id", ("seq_ts", "event_id"), payload_cols=("value",))
    plan = df._jdf.queryExecution().toString()
    physical = plan.split("== Physical Plan ==")[1]
    assert "Window" not in physical
    assert "partial_max" in physical or "partial_" in physical


def test_cdc_snapshot_incremental_equals_batch_fold(spark, tmp_path):
    """Drain the op log through the incremental CDC maintainer in
    multiple micro-batches whose boundaries INTERLEAVE seq ranges (4
    files split by event_id mod 4, one file per trigger) — the stored
    tombstone-retaining state must still fold to EXACTLY the batch
    materialize_log of the whole log, and a re-drain with the same
    checkpoint must be a no-op."""
    from hadoop_common_spark.operators.cdc import materialize_log
    from hadoop_common_spark.streaming.jobs import cdc_snapshot_incremental

    ops = _ops_df(spark)
    src = str(tmp_path / "oplog")
    # mod-4 split interleaves seq ranges across files (file i has seqs
    # from the whole time span) — the adversarial batch partitioning
    ops.repartition(4, F.pmod(F.col("event_id"), F.lit(4))).write.parquet(src)

    stream = (
        spark.readStream.schema(ops.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    args = dict(key="user_id", seq_cols=("seq_ts", "event_id"), payload_cols=("value",))
    cdc_snapshot_incremental(stream, out, ckpt, "user_id", ("seq_ts", "event_id"),
                             payload_cols=("value",))

    live = spark.read.parquet(out).filter(F.col("op") != "D").drop("op")
    want = materialize_log(ops, **args)
    assert _rows(live) == _rows(want)

    stream2 = (
        spark.readStream.schema(ops.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    cdc_snapshot_incremental(stream2, out, ckpt, "user_id", ("seq_ts", "event_id"),
                             payload_cols=("value",))
    live2 = spark.read.parquet(out).filter(F.col("op") != "D").drop("op")
    assert _rows(live2) == _rows(want)


# ---------------------------------------------------------------- BFS


def test_bfs_distances_match_python(spark):
    """Third implementation: pure-Python BFS over the same sparsified
    bipartite purchase graph must agree with the 4-round BSP exactly
    (for nodes within 4 hops; unreached nodes absent on both sides)."""
    from collections import deque

    from hadoop_common_spark.queries import load_all

    got = {
        r["node"]: r["distance"]
        for r in load_all()["graph_bfs_distances"].fn(spark, SF_DIR).collect()
    }

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    m = li[li.l_quantity <= 2].merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )
    adj: dict[int, set[int]] = {}
    for u, v in zip(2 * m.o_custkey, 2 * m.l_suppkey + 1):
        adj.setdefault(int(u), set()).add(int(v))
        adj.setdefault(int(v), set()).add(int(u))
    src = min(adj)
    want = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        if want[u] >= 4:
            continue
        for v in adj[u]:
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    assert got == want


# ------------------------------------------------- CDC randomized fuzz


@pytest.mark.parametrize("seed", range(12))
def test_cdc_fold_fuzz_matches_python(spark, seed):
    """Differential fuzz family #6: random op logs (hot keys, seq ties
    broken by op_id, delete/insert/update interleavings) folded four
    ways — materialize_log, a pure-Python fold, an incremental
    cdc_merge chain over IN-ORDER splits (cdc_merge's documented
    precondition: log-ordered delivery, what a binlog feed provides),
    and the tombstone-retaining latest_ops monoid over an ARBITRARY
    row partition (the streaming-state form, which must not need any
    ordering) — all must agree exactly."""
    import random

    from hadoop_common_spark.operators.cdc import (
        cdc_merge,
        latest_ops,
        materialize_log,
    )

    rng = random.Random(9000 + seed)
    n = rng.randrange(30, 120)
    rows = []
    for op_id in range(n):
        key = rng.randrange(1, 12)  # few keys -> long per-key histories
        seq = op_id // 3  # monotone in arrival, frequent ties
        op = rng.choice(["I", "U", "U", "D"])
        # ~15% NULL payloads: updates that SET a column to NULL must
        # survive the merge (the coalesce-upsert bug class)
        val = None if rng.random() < 0.15 else float(rng.randrange(0, 1000))
        rows.append((key, seq, op_id, op, val))
    df = spark.createDataFrame(
        rows, "k long, seq long, op_id long, op string, value double"
    )
    args = dict(key="k", seq_cols=("seq", "op_id"), payload_cols=("value",))

    whole = _rows(materialize_log(df, **args))

    # pure-Python fold: latest (seq, op_id) wins per key; drop 'D'
    best: dict[int, tuple] = {}
    for k, seq, op_id, op, v in rows:
        if k not in best or (seq, op_id) > best[k][:2]:
            best[k] = (seq, op_id, op, v)
    want = sorted(
        (k, s, o, v) for k, (s, o, op, v) in best.items() if op != "D"
    )
    assert whole == want

    # incremental cdc_merge over IN-ORDER splits (arrival == seq order)
    cuts = sorted(rng.sample(range(1, n), 2))
    snap = materialize_log(df.filter(F.col("op_id") < cuts[0]), **args)
    snap = cdc_merge(
        snap,
        df.filter((F.col("op_id") >= cuts[0]) & (F.col("op_id") < cuts[1])),
        **args,
    )
    merged = _rows(cdc_merge(snap, df.filter(F.col("op_id") >= cuts[1]), **args))
    assert merged == whole

    # tombstone monoid over an ARBITRARY partition: no ordering needed
    part = F.pmod(F.hash(F.col("op_id")), F.lit(3))
    state = None
    for p in range(3):
        b = latest_ops(df.filter(part == p), "k", ("seq", "op_id"), "op", ("value",))
        state = b if state is None else latest_ops(
            state.unionByName(b), "k", ("seq", "op_id"), "op", ("value",)
        )
    live = _rows(state.filter(F.col("op") != "D").drop("op"))
    assert live == whole


# --------------------------------------------------- erasure cascade


def test_erasure_cascade_matches_python(spark):
    from hadoop_common_spark.queries import load_all

    got = {
        r["table_name"]: (r["n_purged"], r["n_kept"])
        for r in load_all()["privacy_erasure_cascade"].fn(spark, SF_DIR).collect()
    }
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    erased = {
        int(k) for k in cust.c_custkey if _h60(f"erase:{int(k)}") % 100 < 5
    }
    po = {int(o) for o, c in zip(orders.o_orderkey, orders.o_custkey) if int(c) in erased}
    li_p = sum(1 for k in li.l_orderkey if int(k) in po)
    ev_p = sum(1 for u in ev.user_id if int(u) in erased)
    want = {
        "customer": (len(erased), len(cust) - len(erased)),
        "orders": (len(po), len(orders) - len(po)),
        "lineitem": (li_p, len(li) - li_p),
        "events": (ev_p, len(ev) - ev_p),
    }
    assert got == want
    assert len(erased) > 0  # the 5% bucket is non-empty at this SF


# ------------------------------------------- drift monitor, version diff


def test_embedding_drift_matches_python(spark, emb_pdf):
    got = {
        r["label"]: (r["n_before"], r["n_after"], r["drift_sq_micro2"])
        for r in _run(spark, "embedding_drift_by_label").collect()
    }
    ids = emb_pdf.vec_id.astype("int64")
    mid = (int(ids.min()) + int(ids.max()) + 1) // 2
    sums: dict[tuple, list] = {}
    counts: dict[tuple, int] = {}
    for r in emb_pdf.itertuples(index=False):
        h = int(r.vec_id >= mid)
        k = (r.label, h)
        counts[k] = counts.get(k, 0) + 1
        s = sums.setdefault(k, [0] * len(r.embedding))
        for i, x in enumerate(r.embedding):
            s[i] += math.floor(float(x) * 1000000.0)
    want = {}
    labels = {lbl for lbl, _ in counts}
    for lbl in labels:
        n0, n1 = counts.get((lbl, 0), 0), counts.get((lbl, 1), 0)
        if n0 == 0 or n1 == 0:
            continue  # no paired dims -> absent from the join output
        m0 = [math.floor(float(s) / float(n0)) for s in sums[(lbl, 0)]]
        m1 = [math.floor(float(s) / float(n1)) for s in sums[(lbl, 1)]]
        want[lbl] = (n0, n1, sum((a - b) * (a - b) for a, b in zip(m0, m1)))
    assert got == want


def test_corpus_version_diff_matches_python(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    got = {r["status"]: r["n_docs"] for r in _run(spark, "corpus_version_diff").collect()}
    want: dict[str, int] = {}
    for r in docs.itertuples(index=False):
        in_p = _h60(f"prev:{int(r.doc_id)}") % 100 < 95
        in_c = _h60(f"curr:{int(r.doc_id)}") % 100 < 95
        edited = _h60(f"edit:{int(r.doc_id)}") % 100 < 5
        if not in_p and not in_c:
            continue
        if not in_p:
            s = "added"
        elif not in_c:
            s = "removed"
        elif edited:
            s = "changed"
        else:
            s = "unchanged"
        want[s] = want.get(s, 0) + 1
    assert got == want
    # all four classes exercised at this SF
    assert set(want) == {"added", "removed", "changed", "unchanged"}


# ---------------------------------------------------------- BPE training


def _py_bpe_train(word_counts: dict[str, int], rounds: int, min_count: int = 2):
    """Pure-Python Sennrich BPE on a word-frequency dict."""
    syms = {w: [c for c in w] for w in word_counts}
    merges = []
    for _ in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_counts[w]
        if not counts:
            break
        # max count, ties lexicographic on (left, right)
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_count:
            break
        merges.append((left, right, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def test_bpe_train_matches_python(spark):
    """Third-implementation parity for the iterative trainer: the
    learned merge table AND the final segmentation of every vocabulary
    word must match a pure-Python Sennrich BPE exactly (greedy
    left-to-right application, lexicographic tiebreaks)."""
    import re as _re

    from hadoop_common_spark.operators.bpe import bpe_train
    from hadoop_common_spark.tables import register_views

    register_views(spark, SF_DIR)
    docs = spark.table("documents")
    merges, syms_df = bpe_train(docs, "text", rounds=6)

    wc: dict[str, int] = {}
    for r in pd.read_parquet(f"{SF_DIR}/documents.parquet").itertuples(index=False):
        for w in _re.split(r"\s+", r.text.strip().lower()):
            if w:
                wc[w] = wc.get(w, 0) + 1
    want_merges, want_syms = _py_bpe_train(wc, rounds=6)
    assert merges == want_merges
    assert len(merges) == 6  # corpus is big enough to learn all rounds

    got_syms = {r["w"]: list(r["syms"]) for r in syms_df.collect()}
    assert got_syms == want_syms


def test_bpe_apply_merge_greedy_nonoverlap(spark):
    """'aaaa' under merge (a,a) -> ['aa','aa'] (greedy left-to-right,
    non-overlapping), and a merged token never re-merges with the next
    raw symbol."""
    from hadoop_common_spark.operators.bpe import apply_merge

    df = spark.createDataFrame([(["a", "a", "a", "a"],), (["a", "a", "a"],)], "syms array<string>")
    got = [r[0] for r in df.select(apply_merge(F.col("syms"), "a", "a")).collect()]
    assert got == [["aa", "aa"], ["aa", "a"]]
