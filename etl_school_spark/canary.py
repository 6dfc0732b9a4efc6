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

Both probes warm to JVM STEADY STATE before sampling (r14, VERDICT
item 1): the r14 idle census (tools/idle_canary_census.py, committed
run in tools/anchors/) showed a single idle session's canary settling
from 0.18 to a steady 0.125–0.145 within ~20 executions with NO load —
so a one-shot warm-up left the first recorded canary of a session
measuring a YOUNG JVM (JIT aging), 1.4–2.5× the steady value. That is
exactly the start→end "drop" (0.21–0.33 → 0.12–0.16) the r13 window-
stability gate misread as mid-run host-state change, refusing every
normal run; and the r9–r11 "calm band" (0.20–0.23) was a band of
young-JVM readings. A pure-Python burn A/B on the same host showed no
CPU-frequency component. The fix is in the probe, not the gate: run
enough untimed executions first (~15 codegen / 3 scan) that start-of-
run and end-of-run canaries measure the same steady state — the ×1.2
window comparison is then a genuine contention detector in both
directions. Values from r14 onward are NOT comparable to earlier
rounds' start canaries (they are comparable to earlier END canaries,
which were always steady-state).

Single canary lines are drift INDICATORS, never normalizers for ±5%
deltas — same-session A/Bs remain the only trustworthy speedup
evidence (SCALING.md).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession


def run_canaries(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Run the codegen + scan-shaped drift probes; returns the four
    standard keys (canary_sec/_spread, canary_io_sec/_spread)."""
    # steady-state warm-up (r14): ~25 untimed executions push the probe
    # through C2 compilation in a fresh JVM (idle census: steady by ~20
    # executions; a 15-exec warm-up still read 0.16 on the very first
    # fresh-JVM sample vs the 0.13 steady state); in an already-warm
    # session they cost ~3 s and change nothing — start and end
    # canaries then measure the same state
    for _ in range(25):
        spark.range(500_000_000).selectExpr("sum(id)").collect()
    samples: list[float] = []
    for _ in range(9):
        t0 = time.time()
        spark.range(500_000_000).selectExpr("sum(id)").collect()
        samples.append(time.time() - t0)
    samples.sort()

    doc_path = os.path.join(sf_dir, "documents.parquet")
    for _ in range(3):  # untimed: codegen/footer/page-cache warmup (r14)
        spark.read.parquet(doc_path).count()
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


def settle_canaries(
    spark: SparkSession,
    sf_dir: str,
    band: tuple[float, float],
    retries: int | None = None,
    sleep_sec: float | None = None,
    _sleep=time.sleep,
) -> dict[str, float]:
    """Start-of-run probe with bounded settle-and-reprobe (r14 final-pair
    finding): a START canary can be transiently elevated by state that
    will be gone before the first measured query — the r14 final pair's
    second run started 75 s after its partner's JVM exit and probed
    0.1722 (band top 0.16) while its END canary read a calm 0.1137 and
    its total agreed with the final_ok partner to 0.1%; the stamp was
    refused for a condition that had already passed. Since the probe
    runs BEFORE any measured work, re-probing is honest: when the start
    canary lands outside the calm band, sleep and probe again (default
    2 retries × 45 s, env-tunable via SPARK_GRAFT_CANARY_SETTLE /
    _SETTLE_SLEEP), and record EVERY probe in the artifact
    (``canary_probe_history`` / ``canary_settle_retries``) so a reader
    sees the settling rather than a silently-chosen sample. The LAST
    probe is the official start canary — if the host is genuinely
    loaded, all probes stay out of band and the gates refuse exactly as
    before; only the transient case converts into a citable stamp."""
    if retries is None:
        retries = int(os.environ.get("SPARK_GRAFT_CANARY_SETTLE", "2"))
    if sleep_sec is None:
        sleep_sec = float(os.environ.get("SPARK_GRAFT_CANARY_SETTLE_SLEEP", "45"))
    lo, hi = band
    canaries = run_canaries(spark, sf_dir)
    history = [canaries["canary_sec"]]
    taken = 0
    while not (lo <= canaries["canary_sec"] <= hi) and taken < retries:
        _sleep(sleep_sec)
        taken += 1
        canaries = run_canaries(spark, sf_dir)
        history.append(canaries["canary_sec"])
    canaries["canary_probe_history"] = history
    canaries["canary_settle_retries"] = taken
    return canaries
