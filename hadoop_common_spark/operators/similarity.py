"""Similarity search over embedding columns (array<float>).

Engine extension (north star): approximate-nearest-neighbor over the
`embeddings` table. Two tiers:

- **Brute-force cosine top-k** — the exact baseline. Dot products fold
  in array-index order, which no partitioning can change, so cosine
  values are bit-identical across engines and re-runs without decimal
  arithmetic; ranking on them is therefore deterministic.
- **Sign-LSH bucketing** — the scale path: h hyperplanes with
  deterministic md5-derived coefficients; each vector's bucket is the
  sign pattern of its projections. ANN search probes only the query's
  bucket (optionally neighboring buckets). Bucketing is a narrow map;
  the only shuffle is the bucket equi-join.

The third tier — IVF centroids (k-means Voronoi cells) — lives in
:mod:`hadoop_common_spark.operators.ivf`.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def dot_exact(a: Column, b: Column) -> Column:
    """Double-fold dot product. Deterministic WITHOUT decimals: the fold
    order is fixed by array index (((0+t1)+t2)+…), not by partitioning,
    so Spark and DuckDB (list_reduce, same left fold; 0+t1 == t1) produce
    the identical double — decimal arithmetic would cost ~5× here."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_exact_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity: dot/(sqrt(na)*sqrt(nb)) — identical double
    operands in every engine (see dot_exact)."""
    return dot_exact(a, b) / (F.sqrt(dot_exact(a, a)) * F.sqrt(dot_exact(b, b)))


def cosine_sql(a: str, b: str) -> str:
    return (
        f"({dot_exact_sql(a, b)} / "
        f"(SQRT({dot_exact_sql(a, a)}) * SQRT({dot_exact_sql(b, b)})))"
    )


def cosine_topk_bruteforce(
    data: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector, excluding self.

    queries × data cross join — for a bounded query set this is the
    correct baseline (broadcast the queries); rank via per-query window.
    Norms are computed once per side BEFORE the join (n+q norm
    computations instead of n×q×2) — only the cross dot product is
    per-pair work.
    """
    def with_norm(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        vd = F.transform(F.col(vecc), lambda x: x.cast("double"))
        return df.select(
            F.col(idc), vd.alias(vecc), F.sqrt(dot_exact(vd, vd)).alias(vecc + "_norm")
        )

    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "query_id",
        "q_vec",
    )
    d = with_norm(
        data.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("d_vec")),
        "neighbor_id",
        "d_vec",
    )
    from pyspark.sql import Window

    scored = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            dot_exact(F.col("q_vec"), F.col("d_vec"))
            / (F.col("q_vec_norm") * F.col("d_vec_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _coef_int(plane: int, i: int) -> int:
    # coef(plane, i) = (md5_int(plane || '_' || i) % 2001 - 1000), an
    # integer in [-1000, 1000], later divided by 1000.0 — deterministic
    # pseudo-random hyperplane coefficients, no RNG state. Precomputed in
    # Python (hashlib md5 == Spark/DuckDB md5) so the Spark plan carries
    # ~dim literals per plane instead of ~dim md5() calls per row.
    h = int(hashlib.md5(f"{plane}_{i}".encode()).hexdigest()[:15], 16)
    return h % 2001 - 1000


def sign_lsh_bucket(vec_col: Column, dim: int, planes: int) -> Column:
    """Bucket id = bits of sign(v · hyperplane_p) for p in 0..planes-1.

    Per plane, the projection is a left-to-right fold over
    ``zip_with(vec, coefficients)`` — a compact plan (the unrolled
    ``sum()`` form is planes×dim expression nodes and blows codegen
    compile time). The fold's addition order ((0.0+t1)+t2)+… is exactly
    the chained ``t1 + t2 + …`` order of :func:`sign_lsh_bucket_sql`
    (0.0 + t1 == t1 in IEEE754), so near-zero projections sign
    identically in both engines.
    """
    bucket = F.lit(0).cast("bigint")
    for p in range(planes):
        coefs = F.array(
            *[(F.lit(_coef_int(p, i)).cast("double") / F.lit(1000.0)) for i in range(dim)]
        )
        terms = F.zip_with(vec_col, coefs, lambda x, c: x.cast("double") * c)
        proj = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("bigint")).otherwise(F.lit(0))
    return bucket


def sign_lsh_bucket_sql(vec_expr: str, dim: int, planes: int) -> str:
    terms = []
    for p in range(planes):
        coefs = " + ".join(
            f"(CAST({vec_expr}[{i+1}] AS DOUBLE) * ({_coef_int(p, i)} / 1000.0))"
            for i in range(dim)
        )
        terms.append(f"(CASE WHEN ({coefs}) > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
