"""Program-registry CLI — the ExampleDriver analog.

Reference parity: `EX/ExampleDriver.java` registers every example job
under a name and dispatches from the command line (`hadoop jar
hadoop-mapreduce-examples.jar wordcount in out`). Here every registry
query is runnable by name:

    python -m hadoop_common_spark.cli list
    python -m hadoop_common_spark.cli run wordcount --sf-dir /root/testdata/sf0.001
    python -m hadoop_common_spark.cli run flagship_revenue_by_nation --explain
    python -m hadoop_common_spark.cli run pricing_summary --output /tmp/out.parquet
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hadoop_common_spark.cli", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered query names")
    runp = sub.add_parser("run", help="run one registry query by name")
    runp.add_argument("name")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument("--explain", action="store_true", help="print the formatted plan instead of rows")
    runp.add_argument("--output", help="write result parquet here instead of showing rows")
    runp.add_argument("--show", type=int, default=20, help="rows to show (default 20)")
    args = p.parse_args(argv)

    from hadoop_common_spark.queries import load_all

    registry = load_all()
    if args.cmd == "list":
        for name in sorted(registry):
            print(name)
        return 0

    if args.name not in registry:
        print(f"unknown query {args.name!r} — `list` shows all names", file=sys.stderr)
        return 2

    from hadoop_common_spark.session import get_spark
    from hadoop_common_spark.tables import register_views

    spark = get_spark(f"cli-{args.name}")
    register_views(spark, args.sf_dir)
    df = registry[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    elif args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
