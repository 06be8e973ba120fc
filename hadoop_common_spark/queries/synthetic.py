"""Generator + benchmark-suite queries: TeraGen/TeraSort/TeraValidate,
RandomTextWriter, QuasiMonteCarlo (SURVEY.md §2.11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_common_spark.operators.synthgen import (
    TERAGEN_SQL,
    montecarlo_pi,
    montecarlo_pi_sql,
    random_text,
    random_text_sql,
    teragen,
    teragen_checksum,
)
from hadoop_common_spark.queries import query

N_TERA = 100_000
N_PI = 200_000
N_TEXT = 20_000

_CHECKSUM_ORACLE = f"""
WITH g AS ({TERAGEN_SQL.format(max_i=N_TERA - 1)})
SELECT COUNT(*) AS n_records,
       lpad(CAST(CAST(SUM(('0x' || substr(md5(key || payload), 1, 15))::BIGINT) AS DECIMAL(38,0)) AS VARCHAR), 30, '0') AS checksum
FROM g
"""


@query("teragen_checksum", oracle=_CHECKSUM_ORACLE)
def teragen_checksum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TeraGen + TeraValidate's checksum-sum (TeraGen.java:203-223 →
    TeraValidate comparison): deterministic generation, order-independent
    decimal checksum. Narrow map + partial agg — zero shuffles."""
    return teragen_checksum(teragen(spark, N_TERA))


_TERASORT_ORACLE = f"""
WITH g AS ({TERAGEN_SQL.format(max_i=N_TERA - 1)})
SELECT key, payload FROM g ORDER BY key LIMIT 100
"""


@query("terasort_head", oracle=_TERASORT_ORACLE)
def terasort_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TeraSort head: total-order sort of TeraGen records (orderBy →
    RangePartitioner sampling, the TotalOrderPartitioner+InputSampler
    analog — TeraSort.java:58,177-214), first 100 records. Spark plans
    TakeOrderedAndProject for sort+limit: no full sort materialization."""
    return teragen(spark, N_TERA).orderBy("key").limit(100)


@query("montecarlo_pi", oracle=montecarlo_pi_sql(N_PI))
def montecarlo_pi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuasiMonteCarlo pi (EX/QuasiMonteCarlo.java:87,152-199):
    deterministic md5-derived points, integer in-circle test, global agg."""
    return montecarlo_pi(spark, N_PI)


_RANDTEXT_ORACLE = f"""
WITH g AS ({random_text_sql(N_TEXT)})
SELECT word, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM g)
GROUP BY word
"""


@query("random_text_wordcount", oracle=_RANDTEXT_ORACLE)
def random_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RandomTextWriter + WordCount fused: generate synthetic text rows,
    count the vocabulary. Checks the generator's distribution end-to-end."""
    txt = random_text(spark, N_TEXT)
    return (
        txt.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# First 128 hex digits of pi — the public constant (also the Blowfish
# P-array initialization vector). The BBP kernel must reproduce it
# digit-for-digit; DuckDB just unrolls the constant.
_PI_HEX_128 = (
    "243F6A8885A308D313198A2E03707344A4093822299F31D0082EFA98EC4E6C89"
    "452821E638D01377BE5466CF34E90C6CC0AC29B7C97C50DD3F84D5B5B5470917"
)

_BBP_ORACLE = f"""
SELECT i AS pos, substr('{_PI_HEX_128}', CAST(i AS INT), 1) AS digit
FROM generate_series(1, 128) t(i)
"""


@query("bbp_pi_digits", oracle=_BBP_ORACLE)
def bbp_pi_digits_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BaileyBorweinPlouffe (EX/BaileyBorweinPlouffe.java:92,315): hex
    digits of pi by independent digit-extraction, one contiguous digit
    range per task. Checked against the published constant."""
    from hadoop_common_spark.operators.compute import bbp_pi_digits

    return bbp_pi_digits(spark, 128)


_SUDOKU_PUZZLE = (
    "530070000600195000098000060800060003400803001"
    "700020006060000280000419005000080079"
)
_SUDOKU_SOLUTION = (
    "534678912672195348198342567859761423426853791"
    "713924856961537284287419635345286179"
)


@query("sudoku_distributed", oracle=f"SELECT '{_SUDOKU_SOLUTION}' AS solution")
def sudoku_distributed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact-cover search (EX/dancing/Sudoku.java via
    DistributedPentomino.java:91's prefix fan-out): depth-4 prefix
    enumeration -> 30 independent subtrees -> union of subtree solutions.
    The canonical Wikipedia puzzle has exactly one."""
    from hadoop_common_spark.operators.compute import sudoku_solve_distributed

    return sudoku_solve_distributed(spark, _SUDOKU_PUZZLE, depth=4)


@query("pentomino_count", oracle="SELECT CAST(8 AS BIGINT) AS n_solutions")
def pentomino_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed pentomino tiling (EX/dancing/DistributedPentomino.java
    :91-120, EX/dancing/Pentomino.java:238): depth-4 prefix fan-out ->
    801 disjoint Algorithm-X subtrees (max 83ms each — depth levels the
    skew) -> summed solution count. The 3x20 board's published count is
    8 (2 up to symmetry x the rectangle's 4 symmetries) -- a constant
    oracle, like the reference's known-answer test."""
    from hadoop_common_spark.operators.compute import pentomino_count_distributed

    return pentomino_count_distributed(spark, width=20, height=3, depth=4)
