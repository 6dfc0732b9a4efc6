"""Host-drift canary pair shared by bench.py and tools/sweep_sf1.py
(r10 — previously hand-mirrored in both; one definition keeps them
definitionally identical, per the r9 review note).

Why two flavors: this host drifts ±15–30% between same-code runs, in
two distinct modes that ONE probe cannot see —

- **codegen** (`canary_sec`): a pure JVM codegen sum over a synthetic
  range — no I/O, no Python, no repo code. Median of 9 samples, with
  the spread (max−min) reported so a reader can judge how much
  normalization the point value supports (r9: a 3-sample median still
  wandered 0.20–0.29 s across back-to-back identical runs).
- **scan-shaped** (`canary_io_sec`): a full count of documents.parquet
  via spark.read directly. Added r9 after a drift day where untouched
  queries ran +13–15% while the in-memory sum moved only +2% — page
  cache / I/O scheduler / file-listing drift needs its own probe. Same
  data at the same sf ⇒ cross-round comparable.

Both probes run one UNTIMED warm-up first so their own codegen compile /
parquet-footer read lands outside the samples. Single canary lines are
drift INDICATORS, never normalizers for ±5% deltas — same-session A/Bs
remain the only trustworthy speedup evidence (SCALING.md).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession


def run_canaries(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Run the codegen + scan-shaped drift probes; returns the four
    standard keys (canary_sec/_spread, canary_io_sec/_spread)."""
    spark.range(500_000_000).selectExpr("sum(id)").collect()  # untimed compile
    samples: list[float] = []
    for _ in range(9):
        t0 = time.time()
        spark.range(500_000_000).selectExpr("sum(id)").collect()
        samples.append(time.time() - t0)
    samples.sort()

    doc_path = os.path.join(sf_dir, "documents.parquet")
    spark.read.parquet(doc_path).count()  # untimed: codegen/footer warmup
    io_samples: list[float] = []
    for _ in range(5):
        t0 = time.time()
        spark.read.parquet(doc_path).count()
        io_samples.append(time.time() - t0)
    io_samples.sort()

    return {
        "canary_sec": round(samples[len(samples) // 2], 4),
        "canary_spread": round(samples[-1] - samples[0], 4),
        "canary_io_sec": round(io_samples[len(io_samples) // 2], 4),
        "canary_io_spread": round(io_samples[-1] - io_samples[0], 4),
    }
