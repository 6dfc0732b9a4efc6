"""Per-stage wall-time profile of the registered incremental_dedup_accepted
shape — the r10 instrument for the sf1 sweep-to-sweep variance chase
(r9 observed 20.6–31.4 s across same-code sweeps; SCALING.md records
which stage swings).

Replays exactly the registered query's construction (workload/dedupops
.incremental_dedup_accepted) with dedup_batch_against_index's
stage_clock hook: each lazy stage-boundary checkpoint is forced and
timed, then the final within-batch stage + output sort is timed as the
remainder. Runs the whole profile ``--runs`` times (default 2) in ONE
session so the numbers are same-session comparable (this host's
cross-run drift is ±30%; see SCALING.md).

Usage: python tools/profile_incremental.py [sf_dir] [--runs N]
Default sf_dir: /root/repo/.sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    # consume "--runs N" / "--runs=N" BEFORE positional parsing, so the
    # space-separated form's N is not mistaken for sf_dir (r10 review)
    argv = sys.argv[1:]
    runs = 2
    pos: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs"):
            if "=" in a:
                runs = int(a.split("=", 1)[1])
            else:
                runs = int(argv[i + 1])
                i += 1
        else:
            pos.append(a)
        i += 1
    sf_dir = pos[0] if pos else "/root/repo/.sf1"

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

    spark = get_spark("incremental-profile")
    spark.range(1000).count()

    for run in range(runs):
        docs = load_table(spark, sf_dir, "documents")
        gen0 = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ).filter(F.col("doc_id") % 2 == 0)
        batch = _planted_batch(docs)

        clock: dict = {}
        t0 = time.time()
        index = build_dedup_index(gen0).localCheckpoint(eager=False)
        index.count()
        clock["s0_history_index"] = round(time.time() - t0, 3)

        t0 = time.time()
        _accepted, rows = dedup_batch_against_index(
            batch, index, threshold=0.8, stage_clock=clock
        )
        t_stages = time.time() - t0
        # the function call's remainder beyond every timed stage: this is
        # pure DRIVER-side cost — analyzer runs on each DataFrame
        # construction plus physical planning at each localCheckpoint
        # call (Dataset.checkpoint plans toRdd immediately even with
        # eager=False). The r10 split proved the point: pair/verify
        # EXECUTION is ~0.2-0.3 s and components ~0.2-0.4 s at sf1,
        # while this remainder holds the ~9 s steady floor (SCALING.md).
        in_call = (
            "s1_batch_index", "s2_exact", "s3_history_near",
            "s3b_pairs_verify", "s3c_components",
        )
        clock["s_driver_plan_build"] = round(
            t_stages - sum(clock.get(k, 0.0) for k in in_call), 3
        )
        t0 = time.time()
        out = sorted_single(rows.select(F.col("doc").alias("doc_id"), "fp"), "doc_id")
        out.write.format("noop").mode("overwrite").save()
        clock["s4_within_batch_and_sort"] = round(time.time() - t0, 3)
        clock["total"] = round(
            clock["s0_history_index"] + t_stages + clock["s4_within_batch_and_sort"], 3
        )
        release_batch_checkpoints(_accepted, rows)
        print(json.dumps({"run": run, **clock}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
