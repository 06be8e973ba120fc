"""End-to-end corpus-cleaning pipeline — the composite query a training
data pipeline runs nightly, as ONE lazy plan (the reference would chain
3 jobs with HDFS round-trips between them; JobControl orchestration —
here Catalyst fuses the whole thing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_common_spark.operators.textstats import quality_score, token_count
from hadoop_common_spark.queries import query

_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang, text,
         md5(text) AS content_md5,
         CAST(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tok,
         (0.4 * (CASE WHEN n_tok2 >= 5 AND n_tok2 <= 100000 THEN 1.0 ELSE 0.0 END)
          + 0.3 * (CASE WHEN n_tok2 > 0 AND (n_chars / n_tok2) >= 2.0 AND (n_chars / n_tok2) <= 12.0
                        THEN 1.0 ELSE 0.0 END)
          + 0.3 * (CASE WHEN n_chars > 0
                        THEN CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE) / n_chars
                        ELSE 0.0 END)) AS quality
  FROM (
    SELECT doc_id, lang, text,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+')) END AS DOUBLE) AS n_tok2
    FROM documents
  )
),
kept AS (
  SELECT * FROM scored
  WHERE quality >= 0.5
  QUALIFY ROW_NUMBER() OVER (PARTITION BY content_md5 ORDER BY doc_id) = 1
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM kept
GROUP BY lang
"""


@query("pipeline_clean_corpus", oracle=_ORACLE)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quality filter (≥0.5) → exact dedup (keep min doc_id
    per content hash) → per-language doc/token budget. One plan: scan →
    filter (scan-speed quality expression) → window dedup (one shuffle on
    content hash) → partial-aggregated rollup (one shuffle on lang)."""
    docs = spark.table("documents").select(
        "doc_id",
        "lang",
        F.md5(F.col("text")).alias("content_md5"),
        token_count("text").alias("n_tok"),
        quality_score("text").alias("quality"),
    )
    kept = (
        docs.filter(F.col("quality") >= 0.5)
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("content_md5").orderBy("doc_id")),
        )
        .filter(F.col("_rn") == 1)
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )
