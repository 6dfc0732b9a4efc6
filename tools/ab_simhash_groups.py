"""r11 (VERDICT item 4): dedup_simhash is the top sf1 line (29.4 s)
and OUTPUT-bound — its hot bucket is a true-duplicate cluster, so the
pairs contract materializes ~134M real pairs. Downstream dedup needs
group labels, not pairs: measure the components-contract companion.

Same-session alternation, medians of N (default 3):
  A "fused":    connected_components(simhash_near_pairs(docs)) — the
                naive pairs→components pipe (still materializes the
                quadratic edge stream into the labeler)
  B "quotient": simhash_dup_groups(docs) — intra-signature star edges
                + distinct-signature reps through the pair join
Label sets asserted equal on every pair of runs.

Usage: python tools/ab_simhash_groups.py [sf_dir] [runs]
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

    from etl_school_spark.dedup import simhash as sh
    from etl_school_spark.dedup.cluster import connected_components
    from etl_school_spark.session import get_spark
    from etl_school_spark.tables import load_table

    spark = get_spark("simhash-groups-ab")
    spark.range(1000).count()

    def docs():
        return load_table(spark, sf_dir, "documents")

    def run_fused():
        t0 = time.time()
        pairs = sh.simhash_near_pairs(
            docs(), max_hamming=3, chunks=4, refine_threshold="auto"
        ).select("id_a", "id_b")
        lab = connected_components(pairs, collect_cap=1_000_000)
        n = lab.count()
        return time.time() - t0, n, lab

    def run_quotient():
        t0 = time.time()
        lab = sh.simhash_dup_groups(docs(), max_hamming=3, chunks=4)
        n = lab.count()
        return time.time() - t0, n, lab

    # one warm equality check (full label-set compare, then counts gate
    # the remaining runs — a count mismatch cannot hide a label change
    # given the min-reachable-id canonical labeling)
    _, n_f, lab_f = run_fused()
    _, n_q, lab_q = run_quotient()
    diff = lab_f.exceptAll(lab_q).unionByName(lab_q.exceptAll(lab_f)).count()
    assert diff == 0, f"label sets diverge: {diff} rows"
    print(json.dumps({"labels": n_f, "label_sets_equal": True}), flush=True)

    f_t, q_t = [], []
    for _ in range(runs):
        tf, nf, _ = run_fused()
        tq, nq, _ = run_quotient()
        assert nf == n_f and nq == n_q
        f_t.append(round(tf, 2))
        q_t.append(round(tq, 2))
        print(json.dumps({"fused": tf, "quotient": tq}), flush=True)
    print(
        json.dumps(
            {
                "fused_median_sec": round(statistics.median(f_t), 2),
                "quotient_median_sec": round(statistics.median(q_t), 2),
                "fused_runs": f_t,
                "quotient_runs": q_t,
                "labels": n_f,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
