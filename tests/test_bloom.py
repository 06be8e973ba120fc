"""Relational Bloom filter: no false negatives, bounded false positives,
semi-join end-to-end (HC/util/bloom/BloomFilter.java parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_common_spark.operators.bloom import bloom_build, bloom_probe, bloom_semi_join

M, K = 1 << 16, 5


def test_bloom_no_false_negatives(spark):
    members = spark.range(0, 2000).select(F.col("id").alias("key"))
    bloom = bloom_build(members, "key", M, K)
    got = bloom_probe(members, "key", bloom, M, K)
    assert got.count() == 2000  # every member must pass


def test_bloom_false_positive_rate(spark):
    members = spark.range(0, 2000).select(F.col("id").alias("key"))
    bloom = bloom_build(members, "key", M, K)
    outsiders = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("key"))
    fp = bloom_probe(outsiders, "key", bloom, M, K).count()
    # theoretical FPR at n=2000, m=2^16, k=5 is ~2e-4 → expect ~2 of 10k;
    # allow a generous margin
    assert fp < 50


def test_bloom_preserves_multiplicity(spark):
    members = spark.createDataFrame([(1,), (2,)], ["key"])
    bloom = bloom_build(members, "key", M, K)
    dupes = spark.createDataFrame([(1,), (1,), (2,), (99,)], ["key"])
    got = bloom_probe(dupes, "key", bloom, M, K)
    counts = {r.key: r.n for r in got.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get(1) == 2 and counts.get(2) == 1


def test_bloom_semi_join_exact(spark):
    large = spark.range(0, 50_000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    keys = spark.range(0, 100).select((F.col("id") * 250).alias("kk"))  # sparse member set
    got = bloom_semi_join(large, keys, "k", "kk", M, K)
    want = large.join(keys.select(F.col("kk").alias("k")), "k", "left_semi")
    assert sorted(r.k for r in got.collect()) == sorted(r.k for r in want.collect())


def test_bloom_negate_partitions_exactly(spark):
    """negate=True ∪ negate=False is a partition of the probed rows, and
    the Bloom-partitioned anti join (definitely-new ∪ exact-anti of the
    may-match) equals a plain exact anti join."""
    from pyspark.sql import functions as F

    from hadoop_common_spark.operators.bloom import bloom_build, bloom_probe

    keys = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    probe = spark.range(250, 1000).select(F.col("id").cast("string").alias("k"))
    sketch = bloom_build(keys, "k")
    may = bloom_probe(probe, "k", sketch)
    new = bloom_probe(probe, "k", sketch, negate=True)
    assert may.count() + new.count() == probe.count()
    # no false negatives: every true member is in the may-match side
    assert may.join(keys, "k", "left_semi").count() == 250
    composed = new.unionByName(may.join(keys, "k", "left_anti"))
    want = {r.k for r in probe.join(keys, "k", "left_anti").collect()}
    got = {r.k for r in composed.collect()}
    assert got == want
