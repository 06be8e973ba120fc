"""hadoop_common_spark — a PySpark-native analytics engine with the
capabilities of the Hadoop MapReduce stack (see SURVEY.md / COVERAGE.md).

Public surface, by task:

    from hadoop_common_spark import session, tables
    spark = session.get_spark()
    t = tables.load_tables(spark, sf_dir)

    # scans/sinks        sources.readers (incl. DistCp -update/-delete) /
    #                    sources.writers (incl. MapFile lookups, compaction)
    # row transforms     operators.fieldsel, operators.textstats,
    #                    operators.pipe + operators.typedbytes (all three
    #                    Streaming framings: text, typed-bytes, raw-bytes)
    # joins              operators.joins (multiway, override, broadcast, asof, ...)
    # aggregation        operators.aggregate (8-type DSL), operators.udaf,
    #                    functions.exact (bit-stable double sums),
    #                    functions.counters (df.observe)
    # sort/partition     operators.sort, operators.keyspec, operators.skew
    # generators         operators.synthgen (teragen, random text, pi)
    # dedup/similarity   operators.dedup (exact/MinHash/SimHash/Jaccard +
    #                    shared 90/5/5 split), operators.similarity (6 ANN
    #                    tiers, banded LSH + recall calculator, Arrow dot
    #                    kernels, broadcast pair-verify), operators.ivf,
    #                    operators.pq, operators.bloom, operators.cms
    # graph              operators.graph (connected components, PageRank,
    #                    triangle counting / clustering coefficients)
    # profiling          operators.profile (single-scan exact+HLL)
    # compute demos      operators.compute (BBP, Sudoku, Pentomino)
    # multimodal         operators.multimodal
    # streaming          streaming.jobs (windows, stream-stream and
    #                    stream-static joins, foreachBatch), streaming.stateful
    # job DAGs / load    plans.jobcontrol, plans.gridmix (Rumen trace replay)
    # query registry     queries.load_all() — every operator as a named,
    #                    oracle-checked (spark, sf_dir) -> DataFrame query
    # CLI                python -m hadoop_common_spark.cli list|run|distcp|gridmix

Everything is logical-plan construction over the DataFrame API — Catalyst
and Tungsten own execution; no custom physical operators exist anywhere.
"""

from hadoop_common_spark.session import configure_for_scale, get_spark
from hadoop_common_spark.tables import load_tables, register_views

__all__ = [
    "configure_for_scale",
    "get_spark",
    "load_tables",
    "register_views",
]
