"""r11: A/B the ivf_topk probe-selection stage — the new in-kernel
top-nprobe (_probe_cells_arrow) vs the r10 posexplode-all-cells +
Window row_number shape — on the FULL registered-style query at sf1,
same-session alternation, medians of N, result rows asserted equal.

The old shape is reconstructed inline from the still-exported
_all_dists_arrow kernel, so both variants run the identical scoring
back end and differ only in how probes are chosen.

Usage: python tools/ab_ivf_probes.py [sf_dir] [runs] [n_cells] [nprobe]
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
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    nprobe = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_school_spark.functions.vectors import as_double, l2_norm
    from etl_school_spark.session import get_spark
    from etl_school_spark.similarity import ivf
    from etl_school_spark.similarity.ivf import train_centroids
    from etl_school_spark.tables import fan_out, load_table

    spark = get_spark("ivf-probes-ab")
    spark.range(1000).count()

    corpus = fan_out(load_table(spark, sf_dir, "embeddings"))
    centroids = train_centroids(corpus, n_cells)
    queries = corpus.filter(F.col("vec_id") % 25 == 0)
    cvd = as_double(F.col("embedding"))
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        cvd.alias("cv"),
        l2_norm(cvd).alias("_nc"),
        ivf._nearest_cell_arrow(centroids)(F.col("embedding")).alias("cell"),
    ).localCheckpoint()  # shared assignment: the A/B isolates the probe stage

    def probes_old():
        ds = ivf._all_dists_arrow(centroids)(F.col("qv"))
        q = queries.select(
            F.col("vec_id").alias("query_id"), cvd.alias("qv"), l2_norm(cvd).alias("_nq")
        ).select("query_id", "qv", "_nq", F.posexplode(ds).alias("cell", "dist"))
        wq = Window.partitionBy("query_id").orderBy("dist", "cell")
        return (
            q.withColumn("_pr", F.row_number().over(wq))
            .filter(F.col("_pr") <= nprobe)
            .select("query_id", "qv", "_nq", "cell")
        )

    def probes_new():
        pc = ivf._probe_cells_arrow(centroids, nprobe)
        return queries.select(
            F.col("vec_id").alias("query_id"), cvd.alias("qv"), l2_norm(cvd).alias("_nq")
        ).select("query_id", "qv", "_nq", F.explode(pc(F.col("qv"))).alias("cell"))

    def run(form):
        t0 = time.time()
        probes = probes_old() if form == "old" else probes_new()
        scored = ivf._cogroup_gemm_scores(probes, c, 5)
        w = Window.partitionBy("query_id").orderBy(F.desc("score_raw"), "neighbor_id")
        out = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id", "score_raw", "rank")
        )
        vals = sorted(map(tuple, out.collect()))
        return time.time() - t0, vals

    run("new")  # warm
    t_old, t_new = [], []
    for _ in range(runs):
        to, vo = run("old")
        tn, vn = run("new")
        assert vo == vn, "probe forms changed the ANN answer"
        t_old.append(round(to, 2))
        t_new.append(round(tn, 2))
        print(json.dumps({"old": to, "new": tn}), flush=True)
    print(
        json.dumps(
            {
                "n_cells": n_cells,
                "nprobe": nprobe,
                "old_median_sec": round(statistics.median(t_old), 2),
                "new_median_sec": round(statistics.median(t_new), 2),
                "old_runs": t_old,
                "new_runs": t_new,
                "outputs_equal": True,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
