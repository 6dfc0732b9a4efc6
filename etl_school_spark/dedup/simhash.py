"""SimHash near-dup detection: 64-bit signature + band blocking.

SimHash packs a document's token set into 64 bits such that hamming
distance approximates (1 - cosine) of the token vectors. Blocking uses
the pigeonhole principle: with the signature split into ``chunks`` equal
chunks, any pair within hamming distance ``max_hamming`` < chunks must
agree exactly on at least one chunk — so bucketing on (chunk_idx,
chunk_value) finds ALL such pairs (no false negatives), and an exact
hamming verify removes false positives.

r3 rewrite, same output: the signature is ONE BIGINT word
(functions.text.simhash64_packed), chunk keys are masked words, pairs
are emitted exactly once at their FIRST agreeing chunk (an XOR+AND
word filter — no dropDuplicates shuffle), and the hamming verify is
``bit_count(a XOR b)``. The previous formulation shuffled two
64-element signature arrays per candidate row into a pair-dedup
exchange; on the sf1 tiled corpus (dense chunk blocks: every doc has 9
byte-identical copies) that allocation pattern killed the local
session with GC thrash. The word form carries 16 bytes per side.

One shuffle on chunk buckets; signatures are one linear expression-only
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_school_spark.functions.text import _signed64, simhash64_packed


def _chunk_masks(chunks: int) -> list[int]:
    chunk_size = 64 // chunks
    return [
        _signed64(((1 << chunk_size) - 1) << (c * chunk_size)) for c in range(chunks)
    ]


def simhash_chunk_rows(
    docs: DataFrame,
    chunks: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, _sig, t, key) chunk-bucket membership rows — the blocking
    frame of ``simhash_near_pairs``, exposed so the skew census
    (dedup/census.py) measures exactly the bucket distribution the
    candidate self-join will see."""
    signed = docs.select(
        F.col(id_col).alias("doc"), simhash64_packed(text_col).alias("_sig")
    )
    buckets = F.array(
        *[
            F.struct(F.lit(c).alias("t"), F.expr(f"_sig & {m}L").alias("key"))
            for c, m in enumerate(_chunk_masks(chunks))
        ]
    )
    return signed.select("doc", "_sig", F.explode(buckets).alias("b")).select(
        "doc", "_sig", "b.t", "b.key"
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs (i < j) with SimHash hamming distance ≤ max_hamming.

    Exact under the pigeonhole guarantee (requires max_hamming < chunks).
    Returns: id_a, id_b, hamming_dist (long).

    Precondition: ``id_col`` values are unique (the standard contract for
    a corpus keyed by doc id — the same assumption exact.py's
    fingerprint groupBy makes). Duplicate ids would emit one pair row
    per in-bucket row combination: the first-collision filter is
    exactly-once per ROW pair, and the dedup-shuffle-free design
    deliberately has no pair-level dropDuplicates to collapse id-level
    duplicates.
    """
    if max_hamming >= chunks:
        raise ValueError("pigeonhole blocking needs max_hamming < chunks")
    masks = _chunk_masks(chunks)
    ids = simhash_chunk_rows(docs, chunks, id_col, text_col)
    # exactly-once emission WITHOUT a dedup shuffle (the knn.py
    # first-collision pattern): a pair is kept only at the first chunk
    # on which the two signatures agree — pure word ops per pair row
    case_chain = (
        "CASE "
        + " ".join(f"WHEN ((sa ^ sb) & {m}L) = 0L THEN {c}" for c, m in enumerate(masks))
        + " ELSE -1 END"
    )
    # Pair generation stays a self-JOIN (rows stream through codegen
    # filters), NOT the operators/pairs.py groupBy-array expansion: at
    # sf1 the tiled corpus has simhash chunk buckets of up to 16,390
    # members (near-identical template docs agree on whole chunks), and
    # a collect_list expansion would materialize ~134M pair structs in
    # ONE row (r8, measured: the array shape never finished at sf1,
    # while the join streams the same ~half-billion candidates fine).
    # The join computes the signature scan on both sides — Spark
    # broadcasts the build side and ReuseExchange does not apply across
    # a broadcast boundary (r8: a shuffle_hash hint did not recover
    # reuse under AQE either) — so the scan itself was made cheap
    # instead: see _simhash_bit_sums (conv halves + long shift/mask).
    return (
        ids.alias("a")
        .join(ids.alias("b"), ["t", "key"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a._sig").alias("sa"),
            F.col("b._sig").alias("sb"),
            F.col("t"),
        )
        .filter(F.expr(f"({case_chain}) = t"))
        .withColumn("hamming_dist", F.bit_count(F.expr("sa ^ sb")).cast("long"))
        .filter(F.col("hamming_dist") <= max_hamming)
        .select("id_a", "id_b", "hamming_dist")
    )
