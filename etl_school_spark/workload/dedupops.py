"""Near-duplicate detection workload over the documents table.

- ngram_jaccard: exact inverted-index set-similarity join, oracle-checked
  against a brute-force DuckDB pair scan (feasible at oracle scale).
- minhash_lsh: probabilistic scale path, rows-only driver check; its
  equivalence to the exact result on this corpus is asserted in
  tests/test_dedup.py (the planted near-dups at jaccard ≈ 0.99 sit far
  above the 32×4-band S-curve's 0.8 threshold, so recall is 1.0 here).
- simhash: pigeonhole-blocked hamming near-dup, rows-only + tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_school_spark.dedup.minhash import minhash_lsh_pairs
from etl_school_spark.dedup.ngram import ngram_jaccard_pairs
from etl_school_spark.dedup.simhash import simhash_near_pairs
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


# Brute-force exact word-trigram Jaccard in DuckDB (O(n²) — oracle scale only).
_NGRAM_ORACLE = """
WITH t AS (SELECT doc_id, string_split(trim(text), ' ') w FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([array_to_string(w[i:i+2], ' ') for i in generate_series(1, len(w)-2)])
              ELSE [] END AS s
  FROM t
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.s, b.s))*1.0
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM sh a, sh b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.s, b.s))*1.0
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
ORDER BY id_a, id_b
"""


@_q("dedup_ngram_jaccard", _NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.8, n=3).orderBy("id_a", "id_b")


@_q("dedup_minhash_lsh")  # rows-only: xxhash64 signatures aren't SQL-portable
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.8, n=3).orderBy("id_a", "id_b")


@_q("dedup_simhash")  # rows-only: xxhash64 signatures aren't SQL-portable
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, max_hamming=3, chunks=4).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# Duplicate CLUSTERS: connected components over the near-dup pair graph
# (iterative min-label propagation). Oracle: transitive closure by
# recursive CTE, component = min reachable id — exact equivalence of a
# genuinely iterative DataFrame algorithm.
# --------------------------------------------------------------------------
_CLUSTER_ORACLE = f"""
WITH RECURSIVE pairs AS (
  {_NGRAM_ORACLE.replace("ORDER BY id_a, id_b", "")}
),
und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(s, t) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.s, u.b FROM reach r JOIN und u ON r.t = u.a
)
SELECT s AS node, least(s, min(t)) AS component
FROM reach
GROUP BY s
ORDER BY node
"""


@_q("dedup_clusters", _CLUSTER_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_school_spark.dedup.cluster import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, n=3)
    return connected_components(pairs).orderBy("node")


# --------------------------------------------------------------------------
# The actionable output of dedup: the corpus with only the canonical
# (minimum-id) document retained per exact-content group — a left-semi
# join against the canonical set, which at scale moves only ids.
# --------------------------------------------------------------------------
@_q(
    "corpus_after_exact_dedup",
    """
    WITH fp AS (
      SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS f
      FROM documents
    ),
    canon AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d SEMI JOIN canon USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def corpus_after_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_school_spark.dedup.exact import drop_exact_duplicates

    docs = load_table(spark, sf_dir, "documents")
    return (
        drop_exact_duplicates(docs)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination (GPT-3 appendix C / Dolma style): corpus docs
# sharing any word n-gram with a held-out "benchmark" set. Here the
# benchmark is a deterministic slice of documents (doc_id % 50 = 0) so the
# oracle can reproduce it; at scale the benchmark side is tiny and its
# distinct-gram set is broadcast — the corpus is touched once, map-side.
# --------------------------------------------------------------------------
_CONTAMINATION_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+3], ' ') AS gram
  FROM toks, unnest(generate_series(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 4
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0)
SELECT g.doc_id, COUNT(*) AS overlap_grams
FROM grams g JOIN bench b USING (gram)
WHERE g.doc_id % 50 != 0
GROUP BY g.doc_id
ORDER BY doc_id
"""


@_q("benchmark_contamination", _CONTAMINATION_ORACLE)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from etl_school_spark.dedup.contamination import contaminated_docs

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return contaminated_docs(corpus, bench, n=4).orderBy("doc_id")
