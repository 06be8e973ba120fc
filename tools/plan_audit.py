"""Fleet-wide physical-plan audit: every registry query's plan is checked
against global scale anti-pattern rules, with a JUSTIFIED whitelist for
the deliberate exceptions. The per-query plan pins in tests/ check that
specific designs hold; this gate checks that NO query anywhere regresses
into a shape that dies at 100 TB — a new query (or a Catalyst behavior
change after a Spark upgrade) cannot silently introduce a cartesian
join, a row-at-a-time Python UDF, or an unjustified single-partition
funnel.

Rules over the physical plan string:

- ``cartesian``: CartesianProduct / BroadcastNestedLoopJoin — an
  unkeyed join is quadratic; only tolerable when one side is a bounded
  broadcast (probe sets, centroid tables) and said so in the whitelist.
- ``row_python_udf``: BatchEvalPython — a row-at-a-time Python UDF in
  the hot path (Arrow paths render as ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas and are fine).
- ``single_partition``: Exchange SinglePartition whose child is NOT a
  partial aggregate — a global funnel over real rows. (The two-phase
  global aggregate — SinglePartition over one partial-agg row per map
  partition — is the universal benign shape and is auto-excluded; what
  flags is a global Sort/Window funnel, only tolerable on provably-tiny
  inputs and said so in the whitelist.)

Run: ``python tools/plan_audit.py [sf_dir] [name_filter...]`` — plans
are built (analysis only; no data jobs beyond what query construction
itself runs) against the given testdata, default sf0.001.
"""

from __future__ import annotations

import json
import os
import sys

RULES = {
    "cartesian": ("CartesianProduct", "BroadcastNestedLoopJoin"),
    "row_python_udf": ("BatchEvalPython",),
    "single_partition": ("Exchange SinglePartition",),
}

# query -> rule -> why this occurrence is the intended design, bounded at
# scale. An entry here is a CLAIM the plan reviewer can check.
WHITELIST: dict[str, dict[str, str]] = {}


def _add(rule: str, why: str, *names: str) -> None:
    for n in names:
        WHITELIST.setdefault(n, {})[rule] = why


_add(
    "cartesian",
    "brute-force exact cosine baseline: the broadcast side is the bounded "
    "query set (10 probe vectors), so the nested loop is 10×N, not N²",
    "similarity_cosine_topk",
    "similarity_lsh_recall_eval",
    "similarity_pq_recall_eval",
    "similarity_matryoshka_recall_eval",
)
_add(
    "cartesian",
    "IVF/PQ probe-assignment: the broadcast side is the centroid/codebook "
    "table (k≤256 rows) — every vector scans k centroids, which IS the "
    "IVF algorithm; candidates afterwards flow through equi-joins",
    "similarity_ivf_topk",
    "similarity_ivfpq_topk",
    "similarity_pq_topk",
    "similarity_lsh_multiprobe_topk",
)
_add(
    "cartesian",
    "brute-force eval leg: the broadcast side is the bounded probe set "
    "(50 labeled vectors) — the whitelisted eval shape",
    "similarity_knn_label_eval",
)
_add(
    "cartesian",
    "Lloyd assignment: the broadcast side is ONE ROW holding the K=8 "
    "seed centroids as an array; argmin is a per-row array_min, so the "
    "'cross' join distributes a constant table — K×N work, map-side",
    "embedding_kmeans_step",
)
_add(
    "cartesian",
    "BFS source attach: the broadcast side is the ONE-ROW min-node-id "
    "scalar seeding distance 0 — a scalar attach, never a row multiplier",
    "graph_bfs_distances",
)
_add(
    "cartesian",
    "farthest-first seed attach: each 'cross' join broadcasts the ONE-ROW "
    "newest seed vector (k=4 rounds, one row each) against the running "
    "min-distance relation — k scalar attaches, never a row multiplier",
    "embedding_kcenter_seeds",
)
_add(
    "cartesian",
    "sketch-pair matrix: BOTH nested-loop sides are sample-sized — the "
    "|types|^2/2 pair list (tens of rows) against the union of 64-hash "
    "KMV signatures (|types|*64 rows); corpus-scale data only flows "
    "through the distinct + two-phase bottom-k upstream",
    "events_audience_overlap_kmv",
)
_add(
    "cartesian",
    "audit-row assembly: each 'cross' join zips two ONE-ROW count "
    "aggregates (n_purged x n_kept) into one audit row per table — "
    "4 rows total, never a row multiplier",
    "privacy_erasure_cascade",
)
_add(
    "cartesian",
    "scalar attach: the broadcast side is the ONE-ROW id-space midpoint "
    "splitting vectors into before/after halves — never a row multiplier",
    "embedding_drift_by_label",
)
_add(
    "cartesian",
    "relational Bloom membership: the broadcast side is the bit-slice "
    "table of one Bloom filter (fixed, tiny); the probe side streams",
    "parts_in_urgent_orders",
    "bloom_fpr_eval",
)
_add(
    "cartesian",
    "scalar attach: the broadcast side is a ONE-ROW global-stats "
    "relation (avg doc length / percentile cutoffs / min-max bounds / "
    "running high-water mark), so the 'cross' join distributes a scalar, "
    "it never multiplies rows",
    "text_bm25_topk",
    "hybrid_search_rerank",
    "corpus_quality_bins",
    "corpus_incremental_ingest",
    "zorder_layout_keys",
    "corpus_temperature_mixture",
    "corpus_dsir_weights",
    "text_pmi_pairs",
    "orders_market_basket",
    "customers_rfm_segments",
    "events_key_skew_report",
)
_add(
    "cartesian",
    "BM25 scalar attach (as text_bm25_topk) plus the anchor exclusion: "
    "the disjunctive (id_a = anchor OR id_b = anchor) join broadcasts a "
    "ONE-ROW anchor frame, so the nested loop is N x 1",
    "text_hard_negatives",
)
_add(
    "single_partition",
    "global pass over the per-bin count aggregate (one row per quality "
    "bin — single digits), not over documents",
    "corpus_quality_bins",
)
_add(
    "single_partition",
    "global_row_number block enumeration: the single-partition window "
    "sorts the per-block COUNT aggregate (one row per input block, "
    "hundreds), never data rows — pinned in "
    "test_global_shuffle_enumerates_without_global_funnel",
    "corpus_global_shuffle",
    "customers_rfm_segments",
    "customers_revenue_gini",
)
_add(
    "single_partition",
    "LAG over the per-MONTH aggregate (dozens of rows however large "
    "orders grows), never order rows",
    "orders_revenue_mom",
)


def audit(sf_dir: str, names: list[str] | None = None) -> dict[str, dict[str, list[str]]]:
    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.session import get_spark

    spark = get_spark("plan-audit")
    reg = load_all()
    jvm = spark._jvm
    violations: dict[str, dict[str, list[str]]] = {}
    for name, qd in sorted(reg.items()):
        if names and not any(s in name for s in names):
            continue
        try:
            df = qd.fn(spark, sf_dir)
            plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
        except Exception as e:  # a query that cannot even plan is itself a finding
            violations[name] = {"plan_error": [f"{type(e).__name__}: {e}"][:1]}
            continue
        lines = plan.splitlines()
        for rule, markers in RULES.items():
            hits = []
            for i, line in enumerate(lines):
                if not any(m in line for m in markers):
                    continue
                if rule == "single_partition":
                    # two-phase global aggregate: the exchange's child is
                    # the partial aggregate (one row per map partition) —
                    # the universal benign shape, not a data funnel
                    child = lines[i + 1] if i + 1 < len(lines) else ""
                    if "partial_" in child:
                        continue
                hits.append(line.strip()[:160])
            if hits and WHITELIST.get(name, {}).get(rule) is None:
                violations.setdefault(name, {})[rule] = hits[:4]
    return violations


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    v = audit(sf_dir, names)
    print(json.dumps(v, indent=1, sort_keys=True))
    print(f"# {len(v)} queries with unwhitelisted findings", file=sys.stderr)
    return 1 if v else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
