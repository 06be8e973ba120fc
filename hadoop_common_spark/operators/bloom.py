"""Bloom filter as relational algebra — membership sketches without any
custom execution.

Reference: HC/util/bloom/BloomFilter.java:83 (add/membershipTest over a
BitSet with k hash functions; Murmur/Jenkins hashing in HC/util/hash/),
used for the semi-join idiom and BloomMapFile's read-skip
(HC/io/BloomMapFile.java:49). Spark already injects runtime bloom
filters into joins; this operator is the *explicit* surface for when the
filter itself is the product (ship a compact membership sketch to
another job, persist it next to a dataset, reference-style).

Representation: the m-bit array lives as a DataFrame of non-zero 64-bit
words ``(word_idx BIGINT, word BIGINT)`` — built with one explode (k
bits per key) + one ``bit_or`` aggregation (map-side combined; ≤ m/64
rows regardless of input cardinality, so the sketch is broadcastable at
any data scale). Probing compacts the words into ONE map column,
broadcasts it, and checks all k bits per row — a narrow pass, no
explode, row multiplicity preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _base_sql(key_col: str) -> str:
    # 60-bit md5-derived base hash (fits signed int64)
    return (
        f"CAST(conv(substring(md5(CAST({key_col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )


def _position_sqls(key_col: str, m_bits: int, k: int) -> list[str]:
    """Kirsch-Mitzenmacher double hashing: position_i = (h1 + i*h2) mod m
    with h1/h2 the low/high 30 bits of the base. Full-alias probability
    between two keys is ~1/m² — a single affine family over one short
    base collapses to P(base collision) = n/2^bits and measurably
    inflates the false-positive rate."""
    base = _base_sql(key_col)
    h1 = f"({base} % 1073741824)"
    h2 = f"({base} DIV 1073741824)"
    return [f"(({h1} + {i} * {h2} + {i * i}) % {m_bits})" for i in range(k)]


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Build the filter: DataFrame of (word_idx, word) non-zero words.

    One explode (k rows/key) + one bit_or aggregation; the shuffle is
    map-side combined down to ≤ m/64 rows total."""
    pos_array = "array(" + ", ".join(_position_sqls(key_col, m_bits, k)) + ")"
    bits = df.select(F.explode(F.expr(pos_array)).alias("_b"))
    return (
        bits.select(
            F.expr("CAST(_b / 64 AS BIGINT)").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_b % 64 AS INT))").alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 5,
    negate: bool = False,
) -> DataFrame:
    """Keep rows whose key MAY be in the filter (no false negatives;
    false-positive rate ~ (1 - e^(-kn/m))^k) — membershipTest parity.
    ``negate=True`` inverts: keep rows that are DEFINITELY absent (some
    bit unset) — the scan-speed "certainly new" split of an incremental
    anti join (only the may-match remainder needs the exact join).

    The word table collapses to a single map literal (≤ m/64 entries,
    128 KiB at m=2^20), broadcast to every task; each row checks its k
    bits against map lookups. One narrow pass over ``df``."""
    flagged = bloom_flag(df, key_col, bloom, "_may", m_bits, k)
    cond = ~F.col("_may") if negate else F.col("_may")
    return flagged.filter(cond).drop("_may")


def bloom_flag(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    flag_col: str = "_may",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """``df`` plus a boolean ``flag_col`` (true = key MAY be in the
    filter). The split-both-ways form: callers that need BOTH the
    definitely-new and the may-match sides flag once and filter twice on
    the same frame — the k hash positions appear once in the plan
    instead of per probe call (and a persisted flagged frame makes the
    split a true single pass at the 100 TB tier)."""
    compact = bloom.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("_bloom")
    )
    checks = [
        f"(coalesce(try_element_at(_bloom, CAST({p} / 64 AS BIGINT)), CAST(0 AS BIGINT))"
        f" & shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))) != 0"
        for p in _position_sqls(key_col, m_bits, k)
    ]
    may_match = " AND ".join(checks)
    return (
        df.crossJoin(F.broadcast(compact))
        .withColumn(flag_col, F.expr(may_match))
        .drop("_bloom")
    )


def bloom_semi_join(
    large: DataFrame,
    keys_df: DataFrame,
    large_key: str,
    keys_key: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """The reference's Bloom semi-join idiom end-to-end: sketch the small
    side's keys, pre-filter the large side with the sketch (narrow, no
    shuffle of ``large``), then exact left_semi to remove false
    positives. At 100 TB the bloom pass discards non-matching rows at
    scan speed before the only shuffle."""
    sketch = bloom_build(keys_df, keys_key, m_bits, k)
    candidates = bloom_probe(large, large_key, sketch, m_bits, k)
    return candidates.join(
        keys_df.select(F.col(keys_key).alias(large_key)).distinct(),
        large_key,
        "left_semi",
    )
