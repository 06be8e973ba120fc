"""hadoop_common_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference Hadoop MapReduce stack
(ICrazyBone/hadoop-common), re-expressed Spark-first.

Design stance (SURVEY.md §7.1):

- Public surface is DataFrame/SQL. Every reference operator is a Python
  function ``DataFrame -> DataFrame`` (or a reader/writer facade) that
  *constructs a Catalyst logical plan* — never custom execution.
- Catalyst/Tungsten/AQE replace the reference's hand-built physical layer
  (map-side sort buffer, spill merges, shuffle server — reference
  ``mapred/MapTask.java``, ``mapred/Merger.java``); we only keep the
  *observable* semantics: hash partitioning by key, optional total-order
  range partitioning, partition-count control.
- Storage is Parquet (replaces SequenceFile/MapFile/TFile); JDBC replaces
  the ``mapreduce.lib.db`` package; text/CSV/binary readers replace the
  text-ish InputFormats.
- Everything is designed for a 1000-executor / 100 TB deployment even
  though tests run on ``local[*]``: no ``collect()`` in operators, no
  driver-side state, broadcast hints only for genuinely small dims,
  range partitioning for global sorts, AQE-friendly plans.
"""

from hadoop_common_spark.session import get_spark, configure_for_scale
from hadoop_common_spark.tables import TABLE_NAMES, load_tables, register_views

__all__ = [
    "get_spark",
    "configure_for_scale",
    "TABLE_NAMES",
    "load_tables",
    "register_views",
]

__version__ = "0.1.0"
