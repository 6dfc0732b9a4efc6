"""r11: with the arrow signature form, the batch pipeline's surv/surv2
subtrees are SMALL plans — but their localCheckpoint calls still pay
4.7 + 4.0 s of toRdd materialization (codegen compile + eager broadcast
builds; see the r11 SCALING entry), while their measured EXECUTION is
0.1–0.3 s. A/B: truncate_stages=True (the r8 shape) vs False (let the
final actions re-execute the sub-second subtrees instead of paying
per-stage toRdd). Same-session alternation on the FULL registered
query shape, medians of N, outputs asserted equal each round.

Usage: python tools/ab_incremental_truncate.py [sf_dir] [runs]
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

    from etl_school_spark.dedup.incremental import (
        build_dedup_index,
        dedup_batch_against_index,
        release_batch_checkpoints,
    )
    from etl_school_spark.session import get_spark
    from etl_school_spark.tables import load_table
    from etl_school_spark.workload._suite import sorted_single
    from etl_school_spark.workload.dedupops import _planted_batch

    spark = get_spark("incremental-truncate-ab")
    spark.range(1000).count()

    def run(truncate: bool):
        t0 = time.time()
        docs = load_table(spark, sf_dir, "documents")
        gen0 = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ).filter(F.col("doc_id") % 2 == 0)
        batch = _planted_batch(docs)
        index = build_dedup_index(gen0).localCheckpoint(eager=False)
        acc, rows = dedup_batch_against_index(
            batch, index, threshold=0.8, truncate_stages=truncate
        )
        out = sorted_single(rows.select(F.col("doc").alias("doc_id"), "fp"), "doc_id")
        vals = [(r.doc_id, r.fp) for r in out.collect()]
        dt = time.time() - t0
        release_batch_checkpoints(acc, rows)
        return dt, vals

    run(True)  # warm
    t_t, t_f = [], []
    for _ in range(runs):
        ta, va = run(True)
        tb, vb = run(False)
        assert va == vb, "outputs diverged between truncation modes"
        t_t.append(round(ta, 2))
        t_f.append(round(tb, 2))
        print(json.dumps({"truncate": ta, "no_truncate": tb}), flush=True)
    print(
        json.dumps(
            {
                "truncate_median_sec": round(statistics.median(t_t), 2),
                "no_truncate_median_sec": round(statistics.median(t_f), 2),
                "truncate_runs": t_t,
                "no_truncate_runs": t_f,
                "outputs_equal": True,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
