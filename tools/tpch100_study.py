"""One-shot 100x TPC-H join-depth study (VERDICT r8 #5).

The standing gated tier stays at 30x (its r8 baseline is the
round-over-round anchor; changing the replica count would invalidate
every diff). This study deepens the evidence one notch without touching
the gate: 100x remapped-keyspace replicas (orders ~270 MB, lineitem
~1.1 GB — far past the 64 MB broadcast threshold, wide enough to force
SortMergeJoin spill paths on a 32-thread local box), N=2 keep-min per
query, plan reads for Q5/Q9/Q18/Q21 (shuffle joins present, dims still
broadcast, no nested loops), and per-query spill totals pulled from the
status REST API (memoryBytesSpilled / diskBytesSpilled summed over the
query's stages). Findings land in BENCH_NOTES.md.

Usage: python tools/tpch100_study.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

REPLICAS = 100
QUERIES = [
    "flagship_revenue_by_nation",
    "local_supplier_volume",       # Q5
    "nation_profit_by_year",       # Q9
    "waiting_suppliers",           # Q21
    "tpch_fk_integrity",
    "pricing_summary",             # Q1
    "large_volume_orders",         # Q18
]
PLAN_PINS = [
    "local_supplier_volume",
    "nation_profit_by_year",
    "large_volume_orders",
    "waiting_suppliers",
]


def _stage_spills(ui: str, app_id: str) -> dict[tuple[int, int], tuple[int, int]]:
    """{(stageId, attemptId): (memoryBytesSpilled, diskBytesSpilled)} over
    ALL stages regardless of status. Per-query attribution is by stage-SET
    difference against a pre-run snapshot, not by differencing cumulative
    sums (ADVICE r9): a stage that finishes registering in the REST store
    slightly after the noop save returns, or ends failed/skipped, would
    otherwise be misattributed to the following query or dropped."""
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages", timeout=10
    ) as r:
        stages = json.load(r)
    return {
        (s["stageId"], s.get("attemptId", 0)): (
            s.get("memoryBytesSpilled", 0),
            s.get("diskBytesSpilled", 0),
        )
        for s in stages
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    from bench import build_tpch_scale_dir
    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.session import configure_for_scale
    from hadoop_common_spark.tables import load_tables

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("tpch100-study")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4047")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    configure_for_scale(spark)
    # uiWebUrl, not the requested port: a port conflict makes Spark bind
    # the next free one (spark.port.maxRetries), and a hardcoded URL
    # would then crash the run AFTER the expensive tier build
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    t0 = time.time()
    tier = build_tpch_scale_dir(spark, sf_dir, replicas=REPLICAS)
    build_sec = round(time.time() - t0, 1)
    sizes = {
        t: round(
            sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _dn, fns in os.walk(os.path.join(tier, f"{t}.parquet"))
                for f in fns
            )
            / 1e6,
            1,
        )
        for t in ("customer", "orders", "lineitem")
    }
    print(f"# tier built in {build_sec}s, MB on disk: {sizes}")

    registry = load_all()
    tabs = load_tables(spark, tier)
    for t in ("customer", "orders", "lineitem"):
        tabs[t].write.mode("overwrite").format("noop").save()

    plans: dict[str, dict] = {}
    for name in PLAN_PINS:
        df = registry[name].fn(spark, tier)
        p = df._jdf.queryExecution().executedPlan().toString()
        plans[name] = {
            "smj": p.count("SortMergeJoin"),
            "shj": p.count("ShuffledHashJoin"),
            "bhj": p.count("BroadcastHashJoin"),
            "nested_loop": ("BroadcastNestedLoopJoin" in p) or ("CartesianProduct" in p),
        }

    results: dict[str, dict] = {}
    for name in QUERIES:
        best, spill_mem, spill_disk = None, 0, 0
        for i in range(2):
            before = _stage_spills(ui, app_id)
            t0 = time.perf_counter()
            registry[name].fn(spark, tier).write.mode("overwrite").format("noop").save()
            el = round(time.perf_counter() - t0, 3)
            # settle window: stages can register in the REST store a beat
            # after the save returns
            time.sleep(0.5)
            after = _stage_spills(ui, app_id)
            new_keys = after.keys() - before.keys()
            m = sum(after[k][0] for k in new_keys)
            d = sum(after[k][1] for k in new_keys)
            if best is None or el < best:
                best, spill_mem, spill_disk = el, m, d
        results[name] = {
            "sec": best,
            "spill_mem_mb": round(spill_mem / 1e6, 1),
            "spill_disk_mb": round(spill_disk / 1e6, 1),
        }
        print(f"# {name}: {json.dumps(results[name])}")

    out = {
        "replicas": REPLICAS,
        "build_sec": build_sec,
        "table_mb": sizes,
        "plans": plans,
        "queries": results,
        "total_sec": round(sum(r["sec"] for r in results.values()), 1),
    }
    print("STUDY_JSON:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
