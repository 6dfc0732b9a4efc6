"""r11: dedup_clusters is the #2 sf1 line (14.2 s in the mid sweep) and
its label stage recomputes the FULL ngram pair join over all documents —
but ngram_dup_groups (the r11 quotient operator) produces provably
identical labels while running the PPJoin over DISTINCT shingle sets
only. Measure swapping the registered query's label source.

Same-session alternation, medians of N (default 3), full registered
output shape (labels + quality window + canonical/keep) both ways:
  A "pairs":    connected_components(ngram_jaccard_pairs(docs), cap)
  B "quotient": ngram_dup_groups(docs, cap)
Full output frames asserted equal once; row counts gate every run.

Usage: python tools/ab_clusters_quotient.py [sf_dir] [runs]
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_school_spark.dedup.cluster import connected_components
    from etl_school_spark.dedup.ngram import ngram_dup_groups, ngram_jaccard_pairs
    from etl_school_spark.functions.text import quality_score
    from etl_school_spark.session import get_spark
    from etl_school_spark.tables import load_table

    spark = get_spark("clusters-quotient-ab")
    spark.range(1000).count()

    def tail(labels, docs):
        q = docs.select(
            F.col("doc_id").alias("node"), quality_score("text").alias("quality")
        )
        w = Window.partitionBy("component").orderBy(F.desc("quality"), "node")
        return (
            labels.join(q, "node")
            .withColumn("canonical", F.first("node").over(w))
            .withColumn("keep", F.col("node") == F.col("canonical"))
            .select("node", "component", "quality", "canonical", "keep")
        )

    def run_pairs():
        t0 = time.time()
        docs = load_table(spark, sf_dir, "documents")
        pairs = ngram_jaccard_pairs(docs, threshold=0.8, n=3)
        out = tail(connected_components(pairs, collect_cap=1_000_000), docs)
        n = out.count()
        return time.time() - t0, n, out

    def run_quotient():
        t0 = time.time()
        docs = load_table(spark, sf_dir, "documents")
        out = tail(ngram_dup_groups(docs, threshold=0.8, n=3, collect_cap=1_000_000), docs)
        n = out.count()
        return time.time() - t0, n, out

    _, n_p, out_p = run_pairs()
    _, n_q, out_q = run_quotient()
    diff = out_p.exceptAll(out_q).unionByName(out_q.exceptAll(out_p)).count()
    assert diff == 0, f"outputs diverge: {diff} rows"
    print(json.dumps({"rows": n_p, "outputs_equal": True}), flush=True)

    p_t, q_t = [], []
    for _ in range(runs):
        tp, np_, _ = run_pairs()
        tq, nq_, _ = run_quotient()
        assert np_ == n_p and nq_ == n_q
        p_t.append(round(tp, 2))
        q_t.append(round(tq, 2))
        print(json.dumps({"pairs": tp, "quotient": tq}), flush=True)
    print(
        json.dumps(
            {
                "pairs_median_sec": round(statistics.median(p_t), 2),
                "quotient_median_sec": round(statistics.median(q_t), 2),
                "pairs_runs": p_t,
                "quotient_runs": q_t,
                "rows": n_p,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
