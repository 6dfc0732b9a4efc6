"""Blocking-bucket size census — the explicit skew-posture instrument
for the banded near-dup self-joins (r9).

The simhash chunk join and the minhash band expansion are both
bucket-quadratic: a bucket of size s contributes s·(s−1)/2 candidate
rows, so ONE hot bucket dominates the whole stage's cost long before it
shows up in totals (the sf1 tiled corpus already produces 16k-member
simhash chunk buckets). This module makes that distribution measurable
with one groupBy-count over exactly the blocking frame each operator
joins on — run per scale by ``tools/bucket_census.py``, numbers recorded
in SCALING.md, and threshold-asserted in tests so the skew posture is a
checked fact, not a hope.

Documented refinement plans, per operator, if the census crosses its
threshold at a new scale (the DECISION the r8 brief asked to be
written down):

- **simhash** (hot bucket = many docs agreeing on one 16-bit chunk —
  template/boilerplate corpora): recursive pigeonhole refinement. A
  bucket holds pairs that agree on chunk t; any pair within hamming
  ``max_hamming`` ≤ 3 has its ≤ 3 differing bits spread over the OTHER
  48 bits, so re-blocking the hot bucket on ``max_hamming + 1`` equal
  sub-chunks of those 48 bits preserves exactness (the pair must agree
  on ≥ 1 sub-chunk) while cutting the expansion to the sub-bucket
  quadratic. Applies recursively; no false negatives introduced.
  IMPLEMENTED (r9): ``simhash_near_pairs(refine_threshold=N)``,
  output-exact (fuzz family 11). TODAY'S DECISION: not enabled for the
  registered query — the join form STREAMS candidate rows through
  codegen filters (no per-bucket materialization), and the measured
  crossover (SCALING.md) shows refinement wins only when hot-bucket
  pairs mostly FAIL the verify (boilerplate: ×0.80 at sf0.1) and loses
  when they are true duplicates (the sf1 tiling: ×2.4) — check the
  census max_size AND the output/candidate ratio before enabling.
- **minhash** (hot bucket = many docs sharing one band hash — usually
  TRUE near-dup clusters): the hazard is pairs_within_groups'
  collect_list expansion materializing O(s²) pair structs in one task.
  Refinement — IMPLEMENTED (r9): ``pairs_within_groups(...,
  max_group_size=N)`` / ``minhash_lsh_pairs(hot_band_threshold=N)``
  routes buckets past the threshold through a row-streaming self-join
  over the re-exploded group (identical pair set, no array
  materialization, child still evaluated once via the shared groupBy
  exchange). The registered query keeps the default None — the two
  shapes are measured equals at today's bucket sizes (max 40 at sf1,
  SCALING.md) and the census tells us when a corpus crosses the line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_school_spark.dedup.minhash import band_rows, minhash_signatures
from etl_school_spark.dedup.ngram import shingle_sets
from etl_school_spark.dedup.simhash import simhash_chunk_rows


def bucket_size_stats(buckets: DataFrame, keys: list[str]) -> dict:
    """Distribution of bucket sizes for a blocking frame, in one
    groupBy-count + one global agg: rows (membership rows), n_buckets,
    max/p50/p99 bucket size, and pair_expansion = Σ s·(s−1)/2 — the
    exact candidate-row count an in-bucket pair generator emits (the
    quadratic the census exists to watch)."""
    sizes = buckets.groupBy(*keys).agg(F.count(F.lit(1)).alias("sz"))
    row = sizes.agg(
        F.sum("sz").alias("rows"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("sz").alias("max_size"),
        F.expr("percentile(sz, 0.5)").alias("p50"),
        F.expr("percentile(sz, 0.99)").alias("p99"),
        F.sum(F.expr("sz * (sz - 1) DIV 2")).alias("pair_expansion"),
    ).first()
    if row["rows"] is None:
        # empty blocking frame (e.g. every signature NULL, or an empty
        # table): the global agg row holds NULL max/percentiles — report
        # zeros instead of crashing on int(None) (r10 ADVICE item)
        return {
            "rows": 0,
            "n_buckets": 0,
            "max_size": 0,
            "p50": 0.0,
            "p99": 0.0,
            "pair_expansion": 0,
        }
    return {
        "rows": int(row["rows"]),
        "n_buckets": int(row["n_buckets"]),
        "max_size": int(row["max_size"]),
        "p50": float(row["p50"]),
        "p99": float(row["p99"]),
        "pair_expansion": int(row["pair_expansion"]),
    }


def simhash_census(
    docs: DataFrame,
    chunks: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Chunk-bucket census of exactly the frame simhash_near_pairs
    self-joins (registered shape: chunks=4)."""
    return bucket_size_stats(
        simhash_chunk_rows(docs, chunks, id_col, text_col), ["t", "key"]
    )


def semantic_census(
    embs: DataFrame,
    n_cells: int | str = "auto",
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Cell-size census of exactly the assignment frame semantic_dedup
    self-joins (similarity/semantic.py) — its pair stage is
    cell-quadratic the same way the band joins are bucket-quadratic, so
    the same instrument applies: ``pair_expansion`` here is the exact
    candidate-row count the within-cell join emits. A hot cell (mass of
    near-identical embeddings) calls for more cells (n_cells ≈ √corpus)
    or a re-clustering pass of that cell — visible here before it costs
    anything. ``n_cells="auto"`` (default, matching semantic_dedup's
    r10 default) applies the ⌈√n⌉ sizing rule so the census measures
    the posture a defaults caller actually gets."""
    from etl_school_spark.similarity.ivf import _nearest_cell_arrow, train_centroids
    from etl_school_spark.similarity.semantic import _auto_cells

    if n_cells == "auto":
        n_cells = _auto_cells(embs.count())
    centroids = train_centroids(embs, n_cells, iters, id_col, vec_col)
    assigned = embs.select(
        _nearest_cell_arrow(centroids)(F.col(vec_col)).alias("cell")
    )
    return bucket_size_stats(assigned, ["cell"])


def minhash_census(
    docs: DataFrame,
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Band-bucket census of exactly the frame minhash_lsh_pairs feeds
    to pairs_within_groups (registered shape: n=3, 128 perms, 32
    bands)."""
    sets = shingle_sets(docs, id_col, text_col, n)
    signed = minhash_signatures(sets, num_perm).filter(F.col("sig").isNotNull())
    return bucket_size_stats(band_rows(signed, num_perm, bands), ["band_idx", "band_hash"])
