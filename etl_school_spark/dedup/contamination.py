"""Benchmark/eval-set contamination detection via n-gram overlap.

The standard decontamination step in LLM training-data pipelines (GPT-3
appendix C; Dolma/OLMo pipelines use 13-gram overlap): a training document
is contaminated if it shares any word n-gram with a held-out benchmark
document.

Scale shape (the 100 TB posture):
- the benchmark side is SMALL (eval suites are KB-MB) → its distinct
  n-gram set is collected into a broadcast hash relation;
- the corpus side explodes each doc's distinct shingles (local, no
  shuffle) and LEFT SEMI joins against the broadcast — the only shuffle
  in the whole pipeline is the per-doc count of MATCHED grams, and
  matched rows are rare by construction.

So the corpus is touched exactly once, map-side, and nothing O(corpus)
is ever shuffled. Reference analog: none (task-brief extension, like the
rest of the dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_school_spark.functions.text import word_shingles


def benchmark_ngrams(benchmark: DataFrame, text_col: str, n: int = 13) -> DataFrame:
    """Distinct word n-grams of the benchmark set — one `gram` column."""
    return (
        benchmark.select(F.explode(word_shingles(text_col, n)).alias("gram"))
        .distinct()
    )


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """Docs sharing >= min_overlap distinct n-grams with the benchmark set.

    Returns (id_col, overlap_grams) — overlap_grams = number of DISTINCT
    shared n-grams. The benchmark gram set is explicitly broadcast.
    """
    from etl_school_spark.tables import fan_out

    grams = F.broadcast(benchmark_ngrams(benchmark, text_col, n))
    # the corpus-side shingle explode is the map-side cost; parallelize a
    # narrow scan up front (no-op when already parallel)
    exploded = fan_out(docs).select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram")
    )
    return (
        exploded.join(grams, "gram", "inner")
        .groupBy(id_col)
        .agg(F.count("*").alias("overlap_grams"))
        .filter(F.col("overlap_grams") >= min_overlap)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """The corpus minus contaminated docs (left anti join on doc id)."""
    bad = contaminated_docs(docs, benchmark, id_col, text_col, n, min_overlap)
    return docs.join(bad.select(id_col), id_col, "left_anti")
