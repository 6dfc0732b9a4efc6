"""Exact n-gram Jaccard near-dup detection via an inverted-index self-join.

Algorithm (the classic set-similarity-join shape):
1. shingle each doc into distinct word n-grams
2. explode to (shingle, doc) postings and self-join on shingle —
   every pair sharing ≥1 shingle becomes a candidate exactly once per
   shared shingle; counting rows per pair yields |A ∩ B|
3. join back each side's shingle-set size; Jaccard = inter/(|A|+|B|-inter)
4. filter ≥ threshold

This is EXACT (any pair with Jaccard ≥ t > 0 shares at least one shingle,
so no candidate is missed) while never materializing the full O(n²) pair
space — the join fan-out is bounded by posting-list sizes. At 100 TB the
classic refinement is prefix filtering (only join on each doc's rarest
shingles); hot shingles here are already mitigated by using n ≥ 3 (near-
unique shingles) and AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_school_spark.functions.text import word_shingles


def shingle_sets(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc"),
        word_shingles(text_col, n).alias("shingles"),
    ).withColumn("set_size", F.size("shingles"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All unordered pairs (i < j) with word-n-gram Jaccard ≥ threshold.

    Returns columns: id_a, id_b, jaccard (double, 6-decimal rounded).
    """
    sets = shingle_sets(docs, id_col, text_col, n)
    postings = sets.select("doc", "set_size", F.explode("shingles").alias("shingle"))

    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # raw double division of identical ints is bit-identical across engines;
    # rounding would only add half-way-boundary risk
    jac = F.col("inter").cast("double") / (F.col("size_a") + F.col("size_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
