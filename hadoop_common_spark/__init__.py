"""hadoop_common_spark — a PySpark-native analytics engine with the
capabilities of the Hadoop MapReduce stack (see SURVEY.md / COVERAGE.md).

Public surface, by task:

    from hadoop_common_spark import session, tables
    spark = session.get_spark()
    t = tables.load_tables(spark, sf_dir)

    # scans/sinks        sources.readers / sources.writers
    # row transforms     operators.fieldsel, operators.textstats, operators.pipe
    # joins              operators.joins (multiway, override, broadcast, asof, ...)
    # aggregation        operators.aggregate (8-type DSL), operators.udaf,
    #                    functions.exact (bit-stable double sums),
    #                    functions.counters (df.observe)
    # sort/partition     operators.sort, operators.keyspec, operators.skew
    # generators         operators.synthgen (teragen, random text, pi)
    # dedup/similarity   operators.dedup, operators.similarity
    # multimodal         operators.multimodal
    # streaming          streaming.jobs, streaming.stateful
    # job DAGs           plans.jobcontrol
    # query registry     queries.load_all() — every operator as a named,
    #                    oracle-checked (spark, sf_dir) -> DataFrame query

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
