"""r12 (VERDICT items 1+4): measure the quotient rep-selection funnel on a
PLANTED mega-clique, and verify AQE skew-join splitting engages on the
star join-back when the join runs as sort-merge (the at-scale shape).

Corpus: sf0.1 documents (5,000 rows) + 50,000 exact copies of one doc —
a 10×-corpus duplicate clique, the copy-heavy regime the set-equality
quotient exists for (a viral doc duplicated across a crawl).

A/B (same session, alternating, medians of N):
  A "window":  the r11 rep selection — Window.partitionBy(
               array_sort(shingles)) + min(doc) — which funnels the
               whole clique (wide shingle rows) through ONE task;
  B "groupBy": the r12 shape — groupBy(sorted set).agg(min(doc)) +
               join-back — map-side partial agg collapses the clique.
Both run the FULL ngram_dup_groups contract (stars + rep PPJoin +
components) from one shared localCheckpoint'ed shingle scan; outputs
asserted identical once.

Skew probe (item 4): with autoBroadcastJoinThreshold=-1 (forcing the
join-back to sort-merge — at 100 TB the reps side is corpus-sized and
cannot broadcast) and the skew thresholds lowered to probe scale
(skewedPartitionThresholdInBytes=1MB, advisory=256KB — the MECHANISM is
what's under test, the 256MB production default only trips at real
sizes), execute the star join BOTH ways and report, for each: whether
AQEShuffleRead (skewed) appears in the final plan, and the
task-partition row histogram of the star output:

  "fused":       reps fed to the join straight off the groupBy — AQE's
                 OptimizeSkewedJoin only pattern-matches a sort-merge
                 join whose children are bare shuffle stages, so the
                 agg-fused build side makes it skip SILENTLY and the
                 whole clique rides ONE task;
  "checkpointed": reps behind localCheckpoint(eager=False) — the
                 SHIPPED form (r12): the build side becomes its own
                 exchange, the pattern matches, and the hot probe
                 partition splits across tasks.

simhash's signature-key star join (simhash.py rep join-back) shares the
fused-build shape, so the same fix ships there; the set-key probe here
is the wide-row worst case of the same plan shape.

Caveat from the probe sessions (recorded so nobody re-chases it): a
probe that only SELECTS ids prunes the wide key out of the shuffle, and
200k identical narrow rows compress below any realistic skew threshold
— always check mapStats bytes (printed here) before concluding the rule
ignored a skewed partition.

Usage: python tools/ab_megaclique.py [sf_dir] [runs] [copies] [--assert-split]

``--assert-split`` (r13, VERDICT item 6): turn the 'coalesced and
skewed' observation into a CHECKED invariant — exit nonzero unless the
checkpointed-build probe actually split the hot partition (skewed read
in the final plan, >4 output partitions, top partition <50% of star
rows). Run it as the one-off gate after any change to the rep-selection
or star-join plan shape.
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--assert-split"]
    assert_split = "--assert-split" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    runs = int(args[1]) if len(args) > 1 else 3
    copies = int(args[2]) if len(args) > 2 else 50_000

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_school_spark.dedup.cluster import connected_components
    from etl_school_spark.dedup.ngram import (
        _jaccard_pairs_from_sets,
        ngram_dup_groups,
        shingle_sets,
    )
    from etl_school_spark.session import get_spark
    from etl_school_spark.tables import load_table

    spark = get_spark("megaclique-ab")
    spark.range(1000).count()

    base_docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seed_text = (
        base_docs.orderBy("doc_id").limit(1).collect()[0].text
    )
    max_id = base_docs.agg(F.max("doc_id")).collect()[0][0]
    planted = spark.range(copies).select(
        (F.col("id") + F.lit(max_id + 1)).alias("doc_id"),
        F.lit(seed_text).alias("text"),
    )
    docs = base_docs.unionByName(planted).localCheckpoint(eager=True)
    n_docs = docs.count()

    def run_window():
        """The r11 form, inline (removed from the library in r12)."""
        t0 = time.time()
        sets = shingle_sets(docs, "doc_id", "text", 3).localCheckpoint(eager=False)
        sets = sets.filter(F.col("set_size") > 0)
        w = Window.partitionBy(F.array_sort("shingles"))
        keyed = sets.withColumn("_rep", F.min("doc").over(w))
        stars = (
            keyed.filter(F.col("doc") != F.col("_rep"))
            .select(F.col("_rep").alias("id_a"), F.col("doc").alias("id_b"))
        )
        rep_sets = keyed.filter(F.col("doc") == F.col("_rep")).select(
            "doc", "shingles", "set_size"
        )
        rep_pairs = _jaccard_pairs_from_sets(rep_sets, 0.8).select("id_a", "id_b")
        out = connected_components(
            rep_pairs.unionByName(stars), collect_cap=1_000_000
        )
        n = out.count()
        return time.time() - t0, n, out

    def run_groupby():
        t0 = time.time()
        out = ngram_dup_groups(docs, threshold=0.8, n=3)
        n = out.count()
        return time.time() - t0, n, out

    # output identity, once
    _, na, a_out = run_window()
    _, nb, b_out = run_groupby()
    assert na == nb, (na, nb)
    diff = a_out.exceptAll(b_out).count() + b_out.exceptAll(a_out).count()
    assert diff == 0, f"outputs differ: {diff} rows"
    print(json.dumps({"rows": na, "n_docs": n_docs, "identical": True}), flush=True)

    times: dict[str, list[float]] = {"window": [], "groupby": []}
    for _ in range(runs):
        t, _, _ = run_window()
        times["window"].append(round(t, 2))
        t, _, _ = run_groupby()
        times["groupby"].append(round(t, 2))
    med = {k: statistics.median(v) for k, v in times.items()}
    print(json.dumps({
        "ab": {k: {"median": med[k], "runs": v} for k, v in times.items()},
        "ratio_groupby_vs_window": round(med["groupby"] / med["window"], 3),
        "copies": copies,
    }), flush=True)

    # ---- skew probe: force the at-scale sort-merge shape ----
    probe_confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in probe_confs}
    for k, v in probe_confs.items():
        spark.conf.set(k, v)
    try:
        # ngram/minhash star join-back: probe side = every doc keyed by
        # its sorted set, build side = one row per distinct set.
        # IMPORTANT: the probe must execute the stars frame ITSELF
        # (collect with an embedded spark_partition_id) — a separate
        # histogram query is a new QueryExecution whose column pruning
        # changes the shuffled bytes and whose plan never finalizes.
        sets = shingle_sets(docs, "doc_id", "text", 3).localCheckpoint(eager=False)
        keyed = sets.filter(F.col("set_size") > 0).select(
            "doc", F.array_sort("shingles").alias("_setkey")
        )

        def star_probe(tag: str, reps) -> dict:
            import collections

            stars = (
                keyed.join(reps, "_setkey")
                .filter(F.col("doc") != F.col("_rep"))
                .select(
                    F.col("_rep").alias("id_a"),
                    F.col("doc").alias("id_b"),
                    F.spark_partition_id().alias("pid"),
                )
            )
            hist = collections.Counter(r.pid for r in stars.collect())
            plan = stars._jdf.queryExecution().executedPlan().toString()
            out = {
                "probe": f"setkey_star_join_{tag}",
                "skewed_read_in_plan": "skewed" in plan,
                "n_output_partitions": len(hist),
                "top_partition_rows": hist.most_common(6),
                "star_rows": sum(hist.values()),
            }
            print(json.dumps(out), flush=True)
            return out

        agg = keyed.groupBy("_setkey").agg(F.min("doc").alias("_rep"))
        star_probe("fused", agg)
        ckpt = star_probe("checkpointed", agg.localCheckpoint(eager=False))
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
    spark.stop()
    if assert_split:
        # the checked invariant (r13, VERDICT item 6): the shipped
        # checkpointed-build form must actually SPLIT the hot probe
        # partition — timing alone can look fine while the whole clique
        # rides one task
        top = ckpt["top_partition_rows"][0][1] if ckpt["top_partition_rows"] else 0
        failures = []
        if not ckpt["skewed_read_in_plan"]:
            failures.append("no skewed AQEShuffleRead in the final plan")
        if ckpt["n_output_partitions"] <= 4:
            failures.append(f"only {ckpt['n_output_partitions']} output partitions")
        if ckpt["star_rows"] and top / ckpt["star_rows"] >= 0.5:
            failures.append(
                f"top partition carries {top}/{ckpt['star_rows']} star rows"
            )
        if failures:
            print(json.dumps({"assert_split": "FAIL", "why": failures}), flush=True)
            return 1
        print(json.dumps({"assert_split": "ok"}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
