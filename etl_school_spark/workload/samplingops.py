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
from etl_school_spark.functions.text import WS_CLASS as _WS
from etl_school_spark.tables import load_table
from etl_school_spark.workload._suite import unordered_output

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
    return unordered_output(deterministic_sample(docs, "doc_id", 0.10).select("doc_id", "lang", "source"))


# class rebalancing: downsample dominant en, keep all rare languages
_QUOTAS = {"en": 0.30, "fr": 1.0, "de": 1.0, "es": 1.0, "zh": 1.0}
_QUOTA_SQL = " OR ".join(
    # fraction >= 1 → keep-all (threshold_hex returns None; no hash clause)
    f"(lang = '{c}')"
    if threshold_hex(f) is None
    else f"(lang = '{c}' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{threshold_hex(f)}')"
    for c, f in _QUOTAS.items()
)


# Train/test split counts, class-rebalancing counts, deterministic
# resharding balance, and concat-and-chunk sequence packing as one suite
# query (UNION ALL over a `bucket` discriminator) so all four sampling /
# layout surfaces share a single driver-correctness slot. Column `m` is a
# second per-branch measure (chars, tokens, or straddling docs) — always
# non-NULL so the cross-engine compare never meets a NULL-vs-NaN edge.
_N_SHARDS = 8
_PACK_CAP = 256  # tokens per training context window

# mixture recipe: 2.5 epochs of the first source band, 1 epoch of the
# second, a 0.4-epoch sample of the third, drop the fourth
_MIX_WEIGHTS = {
    f"src{i}": (2.5 if i < 5 else 1.0 if i < 10 else 0.4 if i < 15 else 0.0)
    for i in range(20)
}


def _mix_values_sql() -> str:
    """The weight table as a VALUES list — k_full + fractional threshold
    derived from the SAME dict the Spark side uses."""
    rows = []
    for cls, w in _MIX_WEIGHTS.items():
        k_full = int(w)
        frac = w - k_full
        t = threshold_hex(frac) if frac > 0 else None
        rows.append(f"('{cls}', {k_full}, {'NULL' if t is None else repr(t)})")
    return ", ".join(rows)

# md5-derived 60-bit int mod shards — the DuckDB twin of sampling.shard_id
_SHARD_SQL = (
    "CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS UBIGINT)"
    f" AS BIGINT) % {_N_SHARDS}"
)


@_q(
    "sampling_counts_suite",
    f"""
    WITH shards AS (
      SELECT doc_id, lang,
             {_SHARD_SQL} AS shard,
             len(regexp_split_to_array(trim(text), '{_WS}')) AS n_tok,
             n_chars,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hb
      FROM documents
    ),
    packed AS (
      SELECT shard, n_tok,
             SUM(n_tok) OVER (PARTITION BY shard ORDER BY hb, doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok AS cum_before
      FROM shards
    ),
    spans AS (
      SELECT shard,
             cum_before // {_PACK_CAP} AS first_window,
             (cum_before + greatest(n_tok, 1) - 1) // {_PACK_CAP} AS last_window
      FROM packed
    ),
    wts(source, k_full, thresh) AS (VALUES {_mix_values_sql()}),
    mix AS MATERIALIZED (
      SELECT d.source, d.doc_id, w.k_full, w.thresh,
             unnest(generate_series(0,
               w.k_full + CASE WHEN w.thresh IS NULL THEN -1 ELSE 0 END)) AS epoch
      FROM documents d JOIN wts w ON d.source = w.source
    )
    SELECT 'split:' || CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_T90}'
                            THEN 'train' ELSE 'test' END AS bucket,
           lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS m
    FROM documents
    GROUP BY bucket, lang
    UNION ALL
    SELECT 'rebalance' AS bucket, lang,
           CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS m
    FROM documents
    WHERE {_QUOTA_SQL}
    GROUP BY lang
    UNION ALL
    SELECT 'shard:' || CAST(shard AS VARCHAR) AS bucket, '-' AS lang,
           CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_tok) AS BIGINT) AS m
    FROM shards
    GROUP BY shard
    UNION ALL
    SELECT 'pack:' || CAST(shard AS VARCHAR) AS bucket, '-' AS lang,
           CAST(MAX(last_window) + 1 AS BIGINT) AS n,
           CAST(SUM(CASE WHEN last_window > first_window THEN 1 ELSE 0 END) AS BIGINT) AS m
    FROM spans
    GROUP BY shard
    UNION ALL
    SELECT 'mixture:' || source AS bucket, '-' AS lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS m
    FROM mix
    WHERE epoch < k_full
       OR substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)), 1, 4) < thresh
    GROUP BY source
    ORDER BY bucket, lang
    """,
)
def sampling_counts_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_school_spark.functions.sampling import (
        mixture_sample,
        pack_concat_windows,
        quota_sample,
        shard_id,
    )
    from etl_school_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    split = (
        train_test_split(docs, "doc_id", 0.90)
        .groupBy(F.concat(F.lit("split:"), F.col("split")).alias("bucket"), "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("m"))
    )
    reb = (
        quota_sample(docs, "doc_id", "lang", _QUOTAS)
        .groupBy(F.lit("rebalance").alias("bucket"), "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("m"))
    )
    toks = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tok")
    )
    shard = (
        toks.withColumn("shard", shard_id("doc_id", _N_SHARDS))
        .groupBy(F.concat(F.lit("shard:"), F.col("shard").cast("string")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("m"))
        .withColumn("lang", F.lit("-"))
    )
    pack = (
        pack_concat_windows(toks, "doc_id", "n_tok", _PACK_CAP, _N_SHARDS)
        .groupBy(F.concat(F.lit("pack:"), F.col("shard").cast("string")).alias("bucket"))
        .agg(
            (F.max("last_window") + F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("last_window") > F.col("first_window"), 1).otherwise(0)
            ).alias("m"),
        )
        .withColumn("lang", F.lit("-"))
    )
    mix = (
        mixture_sample(docs, "doc_id", "source", _MIX_WEIGHTS)
        .groupBy(F.concat(F.lit("mixture:"), F.col("source")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("m"),
        )
        .withColumn("lang", F.lit("-"))
    )
    return (
        split.unionByName(reb)
        .unionByName(shard.select("bucket", "lang", "n", "m"))
        .unionByName(pack.select("bucket", "lang", "n", "m"))
        .unionByName(mix.select("bucket", "lang", "n", "m"))
        .orderBy("bucket", "lang")
    )


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
