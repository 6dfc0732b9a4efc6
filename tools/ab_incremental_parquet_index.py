"""r11 (VERDICT item 2): after the r10 arrow index switch, plan
construction still holds >1/3 of the registered incremental query's
sf1 wall (profile: s_driver_plan_build ~6.6-7.1 s of ~10 s). Two
measurements in ONE session:

1. WHERE the plan-build floor lives: monkeypatch
   DataFrame.localCheckpoint to time each call (eager=False still
   plans toRdd immediately), and time the dedup_batch_against_index
   call itself — splitting "toRdd planning at checkpoints" from
   "analyzer on intermediate DataFrames".
2. Parquet-persisted history index vs localCheckpoint index
   (the production shape the incremental.py docstring prescribes):
   alternate A (localCheckpoint) / B (write parquet + read back) on
   the FULL registered query, medians of 3, outputs asserted equal.

Usage: python tools/ab_incremental_parquet_index.py [sf_dir]
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"


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

    spark = get_spark("incremental-parquet-ab")
    spark.range(1000).count()

    # --- 1. per-checkpoint plan-build split -----------------------------
    # patch the CONCRETE class (pyspark 4: pyspark.sql.DataFrame is the
    # abstract base whose localCheckpoint is a stub; instances are the
    # classic subclass, whose override would shadow a base-class patch)
    DataFrame = type(spark.range(1))
    orig = DataFrame.localCheckpoint
    ck_times: list[float] = []

    def timed(self, eager=True):
        t0 = time.time()
        r = orig(self, eager=eager)
        ck_times.append(round(time.time() - t0, 3))
        return r

    DataFrame.localCheckpoint = timed
    try:
        docs = load_table(spark, sf_dir, "documents")
        gen0 = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ).filter(F.col("doc_id") % 2 == 0)
        batch = _planted_batch(docs)
        t0 = time.time()
        index = build_dedup_index(gen0)
        t_build_hist = time.time() - t0
        index = orig(index, eager=False)
        t0 = time.time()
        acc, rows = dedup_batch_against_index(batch, index, threshold=0.8)
        t_call = time.time() - t0
        print(
            json.dumps(
                {
                    "probe": "plan_build_split",
                    "construct_history_index_sec": round(t_build_hist, 3),
                    "dedup_call_total_sec": round(t_call, 3),
                    "checkpoint_toRdd_secs": ck_times,
                    "checkpoint_toRdd_sum": round(sum(ck_times), 3),
                    "non_checkpoint_analysis": round(t_call - sum(ck_times), 3),
                }
            ),
            flush=True,
        )
        rows.count()
        release_batch_checkpoints(acc, rows)
    finally:
        DataFrame.localCheckpoint = orig

    # --- 2. localCheckpoint vs parquet-persisted history index ----------
    pq = "/tmp/ab_incr_index.parquet"

    def run(form: str):
        t0 = time.time()
        docs = load_table(spark, sf_dir, "documents")
        gen0 = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ).filter(F.col("doc_id") % 2 == 0)
        batch = _planted_batch(docs)
        if form == "ckpt":
            index = build_dedup_index(gen0).localCheckpoint(eager=False)
        else:
            build_dedup_index(gen0).write.mode("overwrite").parquet(pq)
            index = spark.read.parquet(pq)
        acc, rows = dedup_batch_against_index(batch, index, threshold=0.8)
        out = sorted_single(rows.select(F.col("doc").alias("doc_id"), "fp"), "doc_id")
        vals = [(r.doc_id, r.fp) for r in out.collect()]
        dt = time.time() - t0
        release_batch_checkpoints(acc, rows)
        return dt, vals

    a_t, b_t = [], []
    run("ckpt")  # warm
    for _ in range(3):
        ta, va = run("ckpt")
        tb, vb = run("parquet")
        assert va == vb, "outputs diverged between index forms"
        a_t.append(round(ta, 2))
        b_t.append(round(tb, 2))
    print(
        json.dumps(
            {
                "probe": "index_form_ab",
                "ckpt_median_sec": round(statistics.median(a_t), 2),
                "parquet_median_sec": round(statistics.median(b_t), 2),
                "ckpt_runs": a_t,
                "parquet_runs": b_t,
                "outputs_equal": True,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
