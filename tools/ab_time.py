"""Fresh-JVM A/B timer: run named registry queries single-shot N times
through the noop sink against a given data dir, reporting EVERY run
(run 1 = the cold number the bench tiers actually record, unlike the
keep-min confirm pass whose minima VERDICT r12 showed drift rosy).

Usage: python tools/ab_time.py <data_dir> <n_runs> <name> [name ...]
Prints one JSON line: {"dir": ..., "runs": {name: [s, s, ...]}}.

Each invocation is ONE fresh JVM; invoke the script repeatedly for
independent cold samples. Honors SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)


def main() -> None:
    data_dir = sys.argv[1]
    n_runs = int(sys.argv[2])
    names = sys.argv[3:]

    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.session import get_spark

    registry = load_all()
    spark = get_spark("ab-time")
    # same untimed warmup as bench.py: JVM/codegen/file-index first-touch
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{data_dir}/lineitem.parquet").limit(1).collect()

    out: dict[str, list[float]] = {}
    for name in names:
        runs: list[float] = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"ab:{name}#{i}")
            t0 = time.perf_counter()
            df = registry[name].fn(spark, data_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr)
    print(json.dumps({"dir": data_dir, "runs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
