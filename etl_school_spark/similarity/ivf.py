"""IVF (inverted-file) approximate nearest neighbor — the classic
coarse-quantizer scale path (FAISS-style IVF-Flat, re-expressed as
DataFrame ops).

Train: a few Lloyd iterations assign every corpus vector to its nearest
of ``n_cells`` centroids. Centroid updates use exact decimal sums so the
result is bit-identical regardless of partition order — training is
deterministic, hence the whole index is reproducible.

Search: a query probes only its ``nprobe`` nearest cells; candidates are
the corpus vectors in those cells (a cell-key equi-join, NOT a cross
join), then exact cosine + per-query top-k. At 100 TB the corpus is
partitioned by cell id, so a probe touches nprobe/n_cells of the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_school_spark.functions.vectors import cosine


def _sq_dist(vec_col: Column, centroid: list[float]) -> Column:
    """Exact-order-independent squared L2 distance to a constant centroid."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest_cell(vec_col: Column, centroids: list[list[float]]) -> Column:
    ds = F.array(*[_sq_dist(vec_col, c) for c in centroids])
    # array_position is 1-based; first match breaks ties deterministically
    return (F.array_position(ds, F.array_min(ds)) - 1).cast("int")


def train_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means: seeded from the ``n_cells`` lowest
    ids, refined with exact-decimal mean updates (order-independent)."""
    seeds = (
        corpus.orderBy(id_col).limit(n_cells).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[0]] for r in seeds]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = corpus.select(
            _nearest_cell(F.col(vec_col), centroids).alias("cell"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
        )
        # decimal(28,14) sums are exact for |x| ≤ ~10^13: associative, so the
        # mean is identical under any partitioning → deterministic training
        means = (
            assigned.groupBy("cell", "pos")
            .agg(
                (F.sum(F.col("x").cast("decimal(28,14)")) / F.count(F.lit(1)))
                .cast("double")
                .alias("m")
            )
            .collect()
        )
        new = {c: [0.0] * dim for c in {r.cell for r in means}}
        for r in means:
            new[r.cell][r.pos] = r.m
        centroids = [new.get(c, centroids[c]) for c in range(n_cells)]
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF probing.

    Same output contract as brute_force_topk / lsh_topk:
    (query_id, neighbor_id, score, rank).
    """
    centroids = train_centroids(corpus, n_cells, iters, id_col, vec_col)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _nearest_cell(F.col(vec_col), centroids).alias("cell"),
    )
    # nprobe nearest cells per query: rank the n_cells distances
    ds = F.array(*[_sq_dist(F.col("qv"), cc) for cc in centroids])
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).select(
        "query_id", "qv", F.posexplode(ds).alias("cell", "dist")
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "cell")
    probes = (
        q.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "qv", "cell")
    )

    cands = probes.join(c, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.withColumn("score_raw", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("score_raw").alias("score"), "rank")
    )
