"""Dump `.explain("formatted")` for named queries to plans/r13/.

Usage: python tools/plan_r13.py <suffix> <name> [name...]
Writes plans/r13/<name>_<suffix>.txt (suffix = before|after), at sf0.1.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(REPO_DIR, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.session import get_spark

    registry = load_all()
    spark = get_spark("plan-r13")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
