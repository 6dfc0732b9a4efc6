"""SimHash near-dup detection: 64-bit signature + band blocking.

SimHash packs a document's token set into 64 bits such that hamming
distance approximates (1 - cosine) of the token vectors. Blocking uses
the pigeonhole principle: with the signature split into ``chunks`` equal
chunks, any pair within hamming distance ``max_hamming`` < chunks must
agree exactly on at least one chunk — so joining on (chunk_idx,
chunk_value) finds ALL such pairs (no false negatives), and an exact
hamming verify removes false positives.

One shuffle on chunk buckets; signatures are one linear expression-only
scan (functions.text.simhash64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_school_spark.functions.text import hamming, simhash64


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs (i < j) with SimHash hamming distance ≤ max_hamming.

    Exact under the pigeonhole guarantee (requires max_hamming < chunks).
    Returns: id_a, id_b, hamming_dist.
    """
    if max_hamming >= chunks:
        raise ValueError("pigeonhole blocking needs max_hamming < chunks")
    chunk_size = 64 // chunks

    signed = docs.select(F.col(id_col).alias("doc"), simhash64(text_col).alias("sig"))
    chunked = signed.select(
        "doc",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(chunks - 1)),
                lambda ci: F.struct(
                    ci.alias("chunk_idx"),
                    F.concat_ws("", F.transform(F.slice(F.col("sig"), ci * chunk_size + 1, chunk_size), lambda v: v.cast("string"))).alias(
                        "chunk_val"
                    ),
                ),
            )
        ).alias("c"),
    ).select("doc", "sig", "c.chunk_idx", "c.chunk_val")

    a, b = chunked.alias("a"), chunked.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("hamming_dist", hamming(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming_dist") <= max_hamming)
        .select("id_a", "id_b", "hamming_dist")
    )
