"""Dense exact top-k cosine via Arrow-batched block matrix multiply.

``brute_force_topk`` (knn.py) states the exact baseline relationally —
broadcast the query set, HOF-fold cosine per (query, corpus) pair. That
is the right declarative form and the oracle anchor, but per-pair
expression evaluation caps throughput. In the same broadcast regime (the
query block fits in executor memory) the identical computation is one
dense matrix product per corpus block: S = Q̂ · Ĉᵀ — a BLAS gemm over an
Arrow batch, orders of magnitude more arithmetic throughput than
row-expression evaluation.

Shape at scale:
- corpus partitions STREAM through ``mapInPandas`` as Arrow batches —
  the corpus is never materialized driver-side;
- the query block is collected once (bounded, |Q| « corpus — the same
  smallness contract ``F.broadcast`` asserts in brute_force_topk) and
  ships to executors inside the serialized closure;
- each batch emits only its local per-query top-k, so the post-gemm
  shuffle is O(batches × |Q| × k) skinny rows; a final window merge
  produces the global top-k.

This is the one place Python-side compute beats Catalyst for this
engine: vectorized BLAS over Arrow batches, never row-at-a-time Python
(the plan shows MapInPandas, no BatchEvalPython).

Scores differ from brute_force_topk only in float summation order
(gemm accumulates in whatever order BLAS picks); neighbor sets are
identical away from exact score ties — asserted against the relational
baseline in tests/test_similarity.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gemm_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query, vectorized.

    Same output contract as knn.brute_force_topk:
    (query_id, neighbor_id, score, rank), self-match excluded, rank by
    (score desc, neighbor_id).
    """
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    # +1 so a self-match inside a batch cannot evict a real neighbor
    # before the SQL-side self-filter runs
    local_k = k + 1

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Qn @ Cn.T  # |Q| × |batch|
            m = min(local_k, S.shape[1])
            # per-query top-m inside the batch (argpartition = O(n));
            # ties at the cut are impossible to resolve locally, so break
            # them the same way the final rank does: by neighbor id
            part = np.argpartition(-S, m - 1, axis=1)[:, :m]
            out_q, out_n, out_s = [], [], []
            for qi in range(S.shape[0]):
                cols = part[qi]
                out_q.extend([q_ids[qi]] * len(cols))
                out_n.extend(ids[cols])
                out_s.extend(S[qi, cols])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "score": out_s}
            )

    local = corpus.mapInPandas(
        score_batches, schema="query_id long, neighbor_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        local.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_pairs_dense(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 2048,
) -> DataFrame:
    """All pairs (i < j) with cosine ≥ threshold, vectorized for the
    DENSE regime.

    ``knn.cosine_pairs_bucketed`` is the scale path when near-dups are
    sparse (LSH blocking prunes the pair space). But when the threshold
    is low or the corpus is near-uniform, the candidate set degenerates
    toward all pairs (the documented LSH worst case, knn.py) — and then
    the right physical form is a block matrix product, not per-pair
    expression evaluation: corpus partitions stream through
    ``mapInPandas`` as Arrow batches, each scored against a broadcast
    normalized block X̂ with one BLAS gemm S = B̂ · X̂ᵀ, emitting only the
    (i < j, S ≥ t) survivors.

    The broadcast block is bounded by ``block`` rows; callers with a
    corpus larger than one block iterate blocks via a keyed union
    driver-side (n/block skinny scans), preserving the streaming shape.
    Scores differ from the HOF-fold baseline only in float summation
    order; pair SETS are identical away from exact-threshold boundary
    ties (asserted in tests/test_similarity.py).
    """
    rows = emb.select(id_col, vec_col).limit(block + 1).collect()
    if len(rows) > block:
        raise ValueError(
            f"cosine_pairs_dense broadcast block capped at {block} rows; "
            "use knn.cosine_pairs_bucketed for larger corpora or raise "
            "`block` if executor memory allows"
        )
    x_ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    t = float(threshold)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            B = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
            S = Bn @ Xn.T  # |batch| × |block|
            bi, xj = np.nonzero((S >= t) & (ids[:, None] < x_ids[None, :]))
            yield pd.DataFrame(
                {
                    "id_a": ids[bi],
                    "id_b": x_ids[xj],
                    "cosine_sim": S[bi, xj],
                }
            )

    return emb.mapInPandas(
        score_batches, schema="id_a long, id_b long, cosine_sim double"
    )
