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
    dcp = sub.add_parser("distcp", help="parallel file copy (DistCp analog)")
    dcp.add_argument("src")
    dcp.add_argument("dst")
    dcp.add_argument("--glob", help="path glob filter, e.g. '*.parquet'")
    dcp.add_argument("--update", action="store_true", help="skip up-to-date files")
    dcp.add_argument("--delete", action="store_true", help="remove extraneous destination files")
    dcp.add_argument("--checksum", action="store_true", help="md5-compare same-length files under --update")
    dcp.add_argument("--chunk-mb", type=int, default=128, help="byte-range chunk size (MB)")
    gmx = sub.add_parser("gridmix", help="replay a Rumen-style job trace as synthetic load")
    gmx.add_argument("trace")
    gmx.add_argument("--policy", choices=["serial", "replay", "stress"], default="serial")
    gmx.add_argument("--byte-scale", type=float, default=1.0)
    gmx.add_argument("--time-scale", type=float, default=0.0)
    tfp = sub.add_parser("tfile", help="dump/convert TFile containers (dumptfile analog)")
    tfp.add_argument("path", help="TFile file or directory")
    tfp.add_argument("--output", help="convert to parquet here instead of dumping")
    tfp.add_argument("--show", type=int, default=20, help="records to dump (default 20)")
    har = sub.add_parser("har", help="list/extract Hadoop Archives (har analog)")
    har.add_argument("path", help=".har directory")
    har.add_argument("--cat", help="print one archived file's bytes to stdout")
    har.add_argument("--output", help="convert to parquet(path, content) here")
    bmf = sub.add_parser(
        "bloommap", help="scan/convert/probe BloomMapFile directories"
    )
    bmf.add_argument("path", help="(Bloom)MapFile directory")
    bmf.add_argument("--get", help="point-lookup one key (bloom-gated)")
    bmf.add_argument("--output", help="convert data to parquet here instead of dumping")
    bmf.add_argument("--show", type=int, default=20, help="records to dump (default 20)")
    args = p.parse_args(argv)

    if args.cmd == "tfile":
        from hadoop_common_spark.session import get_spark
        from hadoop_common_spark.sources.tfile import read_tfile

        df = read_tfile(get_spark("cli-tfile"), args.path)
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
            print(f"wrote {args.output}")
        else:
            df.show(args.show, truncate=False)
        return 0

    if args.cmd == "har":
        if args.cat is not None:
            from hadoop_common_spark.sources.har import har_open

            sys.stdout.buffer.write(har_open(args.path, args.cat))
            return 0
        if args.output:
            from hadoop_common_spark.session import get_spark
            from hadoop_common_spark.sources.har import read_har_df

            read_har_df(get_spark("cli-har"), args.path).write.mode(
                "overwrite"
            ).parquet(args.output)
            print(f"wrote {args.output}")
            return 0
        from hadoop_common_spark.sources.har import har_list

        for p in har_list(args.path):
            print(p)
        return 0

    if args.cmd == "bloommap":
        if args.get is not None:
            # bloom-gated point lookup: no Spark session needed (the
            # reference's `hadoop fs -text`-style local path)
            from hadoop_common_spark.sources.bloommap import BloomMapReader

            r = BloomMapReader(args.path)
            v = r.get(args.get)
            print(v if v is not None else "(not found)")
            return 0 if v is not None else 1
        from hadoop_common_spark.session import get_spark
        from hadoop_common_spark.sources.bloommap import read_bloom_map

        df = read_bloom_map(get_spark("cli-bloommap"), args.path)
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
            print(f"wrote {args.output}")
        else:
            df.show(args.show, truncate=False)
        return 0

    if args.cmd == "distcp":
        from hadoop_common_spark.session import get_spark
        from hadoop_common_spark.sources.readers import distcp

        n = distcp(
            get_spark("cli-distcp"), args.src, args.dst, glob=args.glob,
            chunk_bytes=args.chunk_mb << 20, update=args.update,
            delete=args.delete, checksum=args.checksum,
        )
        print(f"copied {n} files")
        return 0

    if args.cmd == "gridmix":
        from hadoop_common_spark.plans.gridmix import load_trace, replay
        from hadoop_common_spark.session import get_spark

        spark = get_spark("cli-gridmix")
        results = replay(
            spark, load_trace(spark, args.trace), policy=args.policy,
            byte_scale=args.byte_scale, time_scale=args.time_scale,
        )
        for r in results:
            print(f"{r['job_id']}\t{r['rows']} rows\t{r['seconds']}s")
        return 0

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
