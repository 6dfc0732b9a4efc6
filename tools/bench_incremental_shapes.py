"""Measure dedup_batch_against_index end-to-end (noop sink, cold + 3 warm
runs) at one or more scales. The split mirrors the registered
incremental_dedup_accepted query: index = even-id documents, batch = odd-id
documents plus the planted-dup unions.

r7 history: this script compared three history-band-join candidate shapes —
carry_both (r5 first-collision, arrays on both exploded sides),
skinny_dedup (skinny rows + candidate dropDuplicates), carry_batch (array
on the batch side, index array re-joined onto matches). skinny_dedup won at
every scale (sf0.1: 11.3/14.1/13.0 s; sf1: 33.2/39.9/38.4 s warm medians)
and is now the only shape (dedup/incremental.py:_history_band_candidates);
this script remains as the regression harness for that pipeline.

Usage: python tools/bench_incremental_shapes.py [sf_dir ...]
(defaults: /root/testdata/sf0.1 and /root/repo/.sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_school_spark.dedup.incremental import (  # noqa: E402
    build_dedup_index,
    dedup_batch_against_index,
)
from etl_school_spark.session import get_spark  # noqa: E402
from etl_school_spark.tables import load_table  # noqa: E402
from etl_school_spark.workload.dedupops import _planted_batch  # noqa: E402


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/repo/.sf1"]
    spark = get_spark("bench-incremental-shapes")
    for sf_dir in dirs:
        docs = load_table(spark, sf_dir, "documents")
        gen0 = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ).filter(F.col("doc_id") % 2 == 0)
        batch = _planted_batch(docs)
        index = build_dedup_index(gen0).localCheckpoint(eager=True)
        print(f"== {sf_dir}: index={index.count()} batch={batch.count()}")
        samples = []
        for _ in range(4):
            t0 = time.time()
            _, rows = dedup_batch_against_index(batch, index, threshold=0.8)
            rows.select("doc").write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        warm = sorted(samples[1:])[1]
        print(f"cold={samples[0]:7.3f} warm_median={warm:7.3f} all={samples}")
    spark.stop()


if __name__ == "__main__":
    main()
