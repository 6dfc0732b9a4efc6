"""Similarity-search workload over the embeddings table.

The oracle formulation matters: DuckDB's builtin list_cosine_similarity
computes in float32 and diverges from Spark's double fold in the 8th
decimal; the explicit list_zip/list_sum double-cast formulation below is
bit-identical to functions.vectors.cosine (verified 2485/2485 exact on
sf0.001), so scores and therefore ranks match exactly with NO rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_school_spark.similarity.knn import (
    brute_force_topk,
    cosine_pairs_bucketed,
    lsh_topk,
)
from etl_school_spark.tables import load_table

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_COS = """
    list_sum(list_transform(list_zip({a}, {b}), x -> CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE)))
    / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
"""


# --------------------------------------------------------------------------
# Embedding-cosine near-dup pairs: LSH-bucketed candidates + exact-cosine
# verify (no all-pairs cross join in the plan; the brute-force crossJoin
# stays in tests/test_similarity.py as the recall yardstick). The oracle
# is still the exact all-pairs SQL — the bucketed pipeline must and does
# find every qualifying pair (parameters sized for measured recall 1.0,
# see knn.cosine_pairs_bucketed).
# --------------------------------------------------------------------------
@_q(
    "embedding_neardup_pairs",
    f"""
    WITH cos AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_COS.format(a='a.embedding', b='b.embedding')} AS cosine_sim
      FROM embeddings a, embeddings b
      WHERE a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine_sim FROM cos WHERE cosine_sim >= 0.4
    ORDER BY id_a, id_b
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_bucketed(emb, threshold=0.4).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# ANN top-k: brute-force exact baseline (broadcast queries × corpus)
# --------------------------------------------------------------------------
@_q(
    "ann_topk_cosine",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 25 = 0),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             {_COS.format(a='qv', b='cv')} AS score
      FROM q, c WHERE query_id <> neighbor_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, score, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5
    ORDER BY query_id, rank
    """,
)
def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    return brute_force_topk(emb, queries, k=5).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# ANN top-k: random-hyperplane LSH scale path (rows-only; recall asserted
# against the exact baseline in tests/test_similarity.py)
# --------------------------------------------------------------------------
@_q("ann_topk_lsh")
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    # bits=4/tables=16 measured at recall@5 ≈ 0.89 on this corpus (embeddings
    # are near-uniform — real clustered embeddings fare much better)
    return lsh_topk(emb, queries, k=5, bits=4, tables=16).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# Higher-order array functions as a first-class query: per-vector norm
# and element bounds via aggregate/array_min/array_max — all JVM-side,
# scalar outputs (oracle-safe).
# --------------------------------------------------------------------------
@_q(
    "embedding_stats",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS l2_norm,
           CAST(list_min(embedding) AS DOUBLE) AS min_el,
           CAST(list_max(embedding) AS DOUBLE) AS max_el
    FROM embeddings
    ORDER BY vec_id
    """,
)
def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_school_spark.functions.vectors import as_double, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        l2_norm(v).alias("l2_norm"),
        F.array_min(v).alias("min_el"),
        F.array_max(v).alias("max_el"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# ANN top-k: IVF coarse-quantizer scale path (rows-only; recall asserted
# against the exact baseline in tests/test_similarity.py). Deterministic
# k-means training → reproducible index.
# --------------------------------------------------------------------------
@_q("ann_topk_ivf")
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_school_spark.similarity.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    return ivf_topk(emb, queries, k=5, n_cells=16, nprobe=6).orderBy("query_id", "rank")
