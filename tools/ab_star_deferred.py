"""r12: A/B the star-deferred components form (cluster.quotient_components)
against the r12-early form that pushed (rep_pairs ∪ stars) through
connected_components.

Star members appear in exactly one edge (to their clique's min-doc rep),
so their labels are a pure function of the rep graph's labels — pushing
them through the iterative loop makes every propagation round scale
with the corpus DUPLICATION FACTOR, and pushes the edge count past
``collect_cap`` exactly on the copy-heavy corpora the quotient targets.

Corpus: sf0.1 documents + ``copies`` exact copies of one doc. Both
forms run full ngram_dup_groups semantics; outputs asserted identical.
Two regimes per run:

  capped:   collect_cap=1,000,000 (the registered setting) — NOTE:
            after the r12 dispatch landed in quotient_components, a
            star count within the cap routes BACK to the union path,
            so this regime now measures the dispatch itself (r13: the
            deferred form passes star_count = |keyed| − |reps| exactly
            like the registered operators, so the r12 probe's eager
            stars materialization — its ×1.19 organic residual — is
            gone; expected ≈×1.0) unless ``copies`` exceeds the cap.
  loop:     collect_cap=None — both forms take the iterative loop; the
            old form's loop input includes the stars (copies-
            proportional), the deferred form's only the rep graph.

Usage: python tools/ab_star_deferred.py [sf_dir] [runs] [copies]
(copies=0 measures the ORGANIC corpus — the regime the r13 caller-count
dispatch targets.)
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000

    from pyspark.sql import functions as F

    from etl_school_spark.dedup.cluster import (
        connected_components,
        quotient_components,
    )
    from etl_school_spark.dedup.ngram import _jaccard_pairs_from_sets, shingle_sets
    from etl_school_spark.session import get_spark
    from etl_school_spark.tables import load_table

    spark = get_spark("star-deferred-ab")
    spark.range(1000).count()

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seed_text = base.orderBy("doc_id").limit(1).collect()[0].text
    mx = base.agg(F.max("doc_id")).collect()[0][0]
    if copies > 0:
        planted = spark.range(copies).select(
            (F.col("id") + F.lit(mx + 1)).alias("doc_id"),
            F.lit(seed_text).alias("text"),
        )
        base = base.unionByName(planted)
    docs = base.localCheckpoint(eager=True)

    def build_edges():
        sets = shingle_sets(docs, "doc_id", "text", 3).localCheckpoint(eager=False)
        sets = sets.filter(F.col("set_size") > 0)
        keyed = sets.select("doc", F.array_sort("shingles").alias("_setkey"))
        reps = (
            keyed.groupBy("_setkey")
            .agg(F.min("doc").alias("_rep"), F.count(F.lit(1)).alias("_csize"))
            .localCheckpoint(eager=False)
        )
        stars = (
            keyed.join(reps, "_setkey")
            .filter(F.col("doc") != F.col("_rep"))
            .select(F.col("_rep").alias("id_a"), F.col("doc").alias("id_b"))
        )
        rep_sets = reps.select(
            F.col("_rep").alias("doc"),
            F.col("_setkey").alias("shingles"),
            F.size("_setkey").alias("set_size"),
        )
        rep_pairs = _jaccard_pairs_from_sets(rep_sets, 0.8).select("id_a", "id_b")
        return rep_pairs, stars, reps

    def run(form: str, cap):
        t0 = time.time()
        rep_pairs, stars, reps = build_edges()
        if form == "union":
            out = connected_components(
                rep_pairs.unionByName(stars), collect_cap=cap
            )
        else:
            # the SHIPPED caller shape (r13): one tiny aggregate over
            # the reps leaf the operator already materializes
            star_count = None
            if cap is not None:
                row = reps.agg(
                    F.sum("_csize").alias("k"), F.count(F.lit(1)).alias("r")
                ).collect()[0]
                star_count = int(row.k or 0) - int(row.r)
            out = quotient_components(
                rep_pairs, stars, collect_cap=cap, star_count=star_count
            )
        n = out.count()
        return time.time() - t0, n, out

    # output identity, once per regime
    for cap, tag in ((1_000_000, "capped"), (None, "loop")):
        _, na, a = run("union", cap)
        _, nb, b = run("deferred", cap)
        assert na == nb, (tag, na, nb)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        assert diff == 0, (tag, diff)
        times = {"union": [], "deferred": []}
        for _ in range(runs):
            for form in ("union", "deferred"):
                t, _, _ = run(form, cap)
                times[form].append(round(t, 2))
        med = {k: statistics.median(v) for k, v in times.items()}
        print(json.dumps({
            "regime": tag, "copies": copies, "rows": na,
            "union": {"median": med["union"], "runs": times["union"]},
            "deferred": {"median": med["deferred"], "runs": times["deferred"]},
            "ratio": round(med["deferred"] / med["union"], 3),
        }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
