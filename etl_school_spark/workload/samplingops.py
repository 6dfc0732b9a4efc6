"""Sampling / splitting workload — oracle-checked because membership is a
pure md5-prefix function both engines compute identically."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_school_spark.functions.sampling import (
    deterministic_sample,
    threshold_hex,
    train_test_split,
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


_T10 = threshold_hex(0.10)
_T90 = threshold_hex(0.90)


@_q(
    "sample_documents_10pct",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_T10}'
    ORDER BY doc_id
    """,
)
def sample_documents_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 0.10).select("doc_id", "lang", "source").orderBy("doc_id")


# class rebalancing: downsample dominant en, keep all rare languages
_QUOTAS = {"en": 0.30, "fr": 1.0, "de": 1.0, "es": 1.0, "zh": 1.0}
_QUOTA_SQL = " OR ".join(
    # fraction >= 1 → keep-all (threshold_hex returns None; no hash clause)
    f"(lang = '{c}')"
    if threshold_hex(f) is None
    else f"(lang = '{c}' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{threshold_hex(f)}')"
    for c, f in _QUOTAS.items()
)


# Train/test split counts and class-rebalancing counts as one suite query
# (UNION ALL over a `bucket` discriminator) so both sampling surfaces share
# a single driver-correctness slot.
@_q(
    "sampling_counts_suite",
    f"""
    SELECT 'split:' || CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_T90}'
                            THEN 'train' ELSE 'test' END AS bucket,
           lang, COUNT(*) AS n
    FROM documents
    GROUP BY bucket, lang
    UNION ALL
    SELECT 'rebalance' AS bucket, lang, COUNT(*) AS n
    FROM documents
    WHERE {_QUOTA_SQL}
    GROUP BY lang
    ORDER BY bucket, lang
    """,
)
def sampling_counts_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_school_spark.functions.sampling import quota_sample

    docs = load_table(spark, sf_dir, "documents")
    split = (
        train_test_split(docs, "doc_id", 0.90)
        .groupBy(F.concat(F.lit("split:"), F.col("split")).alias("bucket"), "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    reb = (
        quota_sample(docs, "doc_id", "lang", _QUOTAS)
        .groupBy(F.lit("rebalance").alias("bucket"), "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return split.unionByName(reb).orderBy("bucket", "lang")


# --------------------------------------------------------------------------
# Fixed-size per-class sample: exactly k docs per language, chosen by
# hash order (deterministic "random" without an RNG) — the per-class
# window form of reservoir sampling.
# --------------------------------------------------------------------------
@_q(
    "per_class_k_sample",
    """
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang FROM ranked WHERE rn <= 10
    ORDER BY lang, doc_id
    """,
)
def per_class_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from etl_school_spark.functions.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(hash_bucket("doc_id"), "doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 10)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )
