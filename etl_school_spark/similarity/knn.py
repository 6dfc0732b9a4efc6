"""Similarity search over embedding columns (array<float>).

Two strategies with the same output contract (query_id, neighbor_id,
score, rank):

- brute_force_topk: broadcast the (small) query set against the corpus,
  exact cosine per (query, corpus) pair, per-query top-k via window.
  Exact baseline; cost O(|Q|·|corpus|) but fully distributed and
  shuffle-free until the final (tiny) top-k aggregation.

- lsh_topk: random-hyperplane LSH — corpus and queries are bucketed by
  sign-bit codes under ``tables`` independent projections; candidates are
  corpus vectors sharing a bucket with the query in ANY table; exact
  cosine + top-k on candidates only. Probabilistic recall, tunable with
  tables/bits; this is the 100 TB path (shuffle is O(corpus · tables)
  small rows, and each query only scores its buckets).

Hyperplanes are generated from a fixed seed, so results are reproducible.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_school_spark.functions.vectors import as_double, cosine, dot


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup: all pairs (i < j) with cosine ≥ threshold.

    Brute-force exact (the oracle-checkable baseline). The LSH variant with
    the same contract is ``lsh_topk``-style bucketing; at corpus scale use
    that plus this verify step.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.col("cos").alias("cosine_sim"))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self-match excluded).

    Output: query_id, neighbor_id, score (raw double — bit-stable), rank 1..k.
    Ties cannot occur in practice (continuous scores); rank order uses
    (score desc, neighbor_id) for full determinism anyway.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score_raw", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("score_raw").alias("score"), "rank")
    )


def _hyperplanes(dim: int, bits: int, tables: int, seed: int = 7) -> list[list[list[float]]]:
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
        for _ in range(tables)
    ]


def _code(vec_col, planes: list[list[float]]):
    """Sign-bit code of a vector under one table's hyperplanes, as a string."""
    bits = [
        F.when(dot(as_double(vec_col), F.array([F.lit(x) for x in p])) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k cosine neighbors via random-hyperplane LSH.

    Same output contract as brute_force_topk; recall depends on
    bits/tables (more tables → higher recall, more candidates).
    """
    planes = _hyperplanes(dim, bits, tables, seed)

    def bucketed(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        codes = F.array(
            *[
                F.concat(F.lit(f"{t}:"), _code(F.col(vec_alias), planes[t]))
                for t in range(tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias)
        ).select(id_alias, vec_alias, F.explode(codes).alias("bucket"))

    cq = bucketed(queries, "query_id", "qv")
    cc = bucketed(corpus, "neighbor_id", "cv")
    cands = (
        cq.join(cc, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn("score_raw", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("score_raw").alias("score"), "rank")
    )


def lsh_candidate_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pool_bits: int = 64,
    n_subsets: int = 128,
    bits: int = 3,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Candidate (id_a < id_b) pairs sharing ANY subset bucket — the
    blocking stage of ``cosine_pairs_bucketed``, exposed so tests can
    assert the candidate count directly (sub-quadratic behavior on
    clustered corpora, tests/test_similarity.py)."""
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(pool_bits)]
    subsets = [sorted(rng.sample(range(pool_bits), bits)) for _ in range(n_subsets)]

    coded = emb.select(
        F.col(id_col).alias("id"),
        _code(F.col(vec_col), planes).alias("_pool"),
    )
    bucket_keys = F.array(
        *[
            F.concat(F.lit(f"{t}:"), *[F.substring("_pool", b + 1, 1) for b in s])
            for t, s in enumerate(subsets)
        ]
    )
    ids = coded.select("id", F.explode(bucket_keys).alias("bucket"))
    return (
        ids.alias("a")
        .join(ids.alias("b"), "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def cosine_pairs_bucketed(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pool_bits: int = 64,
    n_subsets: int = 128,
    bits: int = 3,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Embedding near-dup pairs via LSH-bucketed candidate generation +
    exact-cosine verify — same output contract as ``cosine_pairs`` with
    no all-pairs cross join in the plan.

    Shape: one ``pool_bits``-bit sign code per vector (computed once),
    ``n_subsets`` overlapping ``bits``-bit subsets of the pool as hash
    tables (combinatorial sharing — cheaper than independent tables),
    candidates = id pairs sharing ANY subset bucket. Candidate rows carry
    only (bucket, id) — vectors are attached AFTER pair dedup, so the
    bucket-join shuffle is skinny. Exact cosine then filters candidates.

    Candidate completeness is probabilistic per missed subset
    ((1 - p^bits)^n_subsets with p = 1 - angle/pi); parameters here are
    sized so every qualifying pair in the test corpora collides in >= 7
    subsets (measured at sf0.001/0.01/0.1, seed 7 — deterministic). On
    near-uniform synthetic data at threshold 0.4 the bucket join
    degenerates toward all candidate pairs (this data is LSH's worst
    case); on real near-dup corpora (threshold ~0.9, clustered) the same
    plan touches only colliding buckets — that is the 100 TB path, with
    ``bits`` scaled up to match the threshold.
    """
    cand = lsh_candidate_pairs(emb, id_col, vec_col, pool_bits, n_subsets, bits, dim, seed)
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.col("cos").alias("cosine_sim"))
    )
