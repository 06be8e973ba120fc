"""IVF (inverted-file) approximate nearest neighbor — the k-means-
bucketed scale path beyond sign-LSH.

No reference analog (MapReduce has no vector ops); this is the
north-star extension's "IVF variant": partition vectors into nlist
Voronoi cells via k-means, search only the nprobe closest cells per
query. Classic IVF-Flat (as in the FAISS paper, Johnson et al. 2017),
expressed relationally:

- **Train**: Lloyd's iterations as DataFrame joins — assign = broadcast
  centroids + min-distance, update = groupBy(cell) mean. The iteration
  count is fixed and small; each iteration is one narrow pass + one
  partial-aggregated shuffle, so training scales linearly.
- **Index**: one narrow pass assigning every vector its cell id —
  storable as a partitioned/bucketed table keyed by cell.
- **Search**: per query, rank cells by centroid distance, take nprobe;
  score only vectors in those cells (equi-join on cell id — the
  quadratic term drops by ~nlist/nprobe).

Determinism: centroids init from md5-ranked sample rows, and all
reductions are per-cell means over a fixed assignment — re-runs yield
identical centroids (float addition order within a cell's mean is the
one partition-dependent step; acceptable for ANN, which is approximate
by contract — recall is asserted in tests, not bit-equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_common_spark.operators.similarity import dot_exact


def _sq_dist(a, b):
    d = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x)


def _assign(vectors: DataFrame, centroids: DataFrame, vec_col: str) -> DataFrame:
    """Nearest centroid per vector: broadcast centroids array, argmin."""
    cents = centroids.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cell"), F.col("centroid")))
        ).alias("_cents")
    )
    scored = vectors.crossJoin(F.broadcast(cents))
    dists = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            _sq_dist(F.col(vec_col), c["centroid"]).alias("d"), c["cell"].alias("cell")
        ),
    )
    return scored.withColumn("cell", F.array_min(dists)["cell"]).drop("_cents")


def kmeans_fit(
    vectors: DataFrame, vec_col: str, id_col: str, nlist: int = 16, iters: int = 3
) -> DataFrame:
    """Lloyd's k-means → (cell, centroid) DataFrame. Deterministic init:
    the nlist rows with smallest md5(id) (a seedless uniform sample)."""
    init = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .withColumn("_r", F.md5(F.col(id_col).cast("string")))
        .orderBy("_r", id_col)
        .limit(nlist)
    )
    # id tie-break: duplicate ids share an md5 rank, and without it the
    # sampled centroids would depend on partition order (pq_codebooks
    # uses the same idiom)
    centroids = init.select(
        (F.row_number().over(Window.orderBy("_r", id_col)) - 1).alias("cell"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
    )
    for _ in range(iters):
        # Update step via posexplode → groupBy(cell, dim-index) mean →
        # array re-assembly. The aggregate is 3 expressions wide at ANY
        # dimensionality — the unrolled alternative (one sum column per
        # dimension) is a thousands-of-column aggregate and a codegen
        # blow-up at real embedding dims (768–4096). Rows fan out ×dim,
        # but map-side partial aggregation collapses them to
        # nlist×dim groups before the shuffle.
        assigned = _assign(vectors, centroids, vec_col)
        per_dim = assigned.select(
            "cell",
            F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
                "_i", "_x"
            ),
        ).groupBy("cell", "_i").agg(F.avg("_x").alias("_m"))
        centroids = (
            per_dim.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("_i", "_m"))).alias("_s"))
            .select("cell", F.transform(F.col("_s"), lambda s: s["_m"]).alias("centroid"))
        )
    # nlist tiny rows, consumed by both the index assign and the search-side
    # cell ranking — materialize once instead of re-running Lloyd's per use
    return centroids.cache()


def ivf_index(vectors: DataFrame, centroids: DataFrame, vec_col: str) -> DataFrame:
    """Assign every vector its cell — the inverted file. Persist this
    partitioned by cell (write_partitioned) for pruned scans."""
    return _assign(vectors, centroids, vec_col)


def ivf_search(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 4,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Top-k cosine neighbors per query, probing nprobe cells.

    Query-side cell ranking reuses the broadcast-centroid argmin; the
    candidate join hits only ~nprobe/nlist of the index. Norms are
    computed once per side BEFORE the candidate join (the per-pair work
    is one dot product), and with nprobe == nlist the result is exactly
    brute-force top-k — the oracle check for the plumbing.

    ``broadcast_probes=True`` (default) broadcasts the probe side —
    right for bounded query sets. For query sets beyond the broadcast
    threshold set it False: the candidate join becomes a shuffle
    equi-join on the cell id, same output. Cell cardinality is only
    ``nlist``, so size ``nlist`` ≫ executor count (or salt the cell key)
    to keep shuffle parallelism at 100-TB index sizes.
    """
    cents = centroids.agg(
        F.array_sort(F.collect_list(F.struct(F.col("cell"), F.col("centroid")))).alias("_cents")
    )
    qd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        qd.alias("q_vec"),
        F.sqrt(dot_exact(qd, qd)).alias("q_norm"),
    )
    q = q.crossJoin(F.broadcast(cents))
    ranked_cells = F.slice(
        F.array_sort(
            F.transform(
                F.col("_cents"),
                lambda c: F.struct(
                    _sq_dist(F.col("q_vec"), c["centroid"]).alias("d"),
                    c["cell"].alias("cell"),
                ),
            )
        ),
        1,
        nprobe,
    )
    probes = q.withColumn("_probe", F.explode(ranked_cells)).select(
        "query_id", "q_vec", "q_norm", F.col("_probe.cell").alias("cell")
    )
    dd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    inv = index.select(
        F.col("cell"),
        F.col(id_col).alias("neighbor_id"),
        dd.alias("d_vec"),
        F.sqrt(dot_exact(dd, dd)).alias("d_norm"),
    )
    probe_side = F.broadcast(probes) if broadcast_probes else probes
    cand = inv.join(probe_side, "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cos",
        dot_exact(F.col("q_vec"), F.col("d_vec")) / (F.col("q_norm") * F.col("d_norm")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
