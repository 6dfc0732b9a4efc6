"""Validate (or refute) bench.py's canary_norm host normalization with a
paired SAME-CODE hot/calm experiment (r13, VERDICT item 1).

The r12 perf verdict rested on canary_norm = total × CALM_CANARY /
canary_sec, which assumes the whole headline mix scales with the
CPU-bound codegen canary. That linearity was never validated — the
canary is a pure JVM sum (no shuffle, no IO, no Python) while the mix
is shuffle/IO-heavy, and the canary samples only the run's FIRST ~10
seconds. This experiment runs the same tree's bench twice in one
session of the machine: once as-is ("calm" — whatever the host gives),
once under a deliberate, CONSTANT CPU load (N spinner processes held
for the whole bench run — the formula's most favorable condition,
since a drifting load additionally breaks the start-of-run sampling).

Reported, for each normalization (codegen canary, scan canary, raw):
the hot/calm agreement ratio — 1.0 means the normalization fully
explains the load; the raw ratio is the damage being corrected. Target
band per the brief: ±5% for a normalization to be trusted.

Usage: python tools/canary_norm_experiment.py [burners] [sf_dir]
(default 24 burners on the 32-cpu box, sf0.1). Writes one JSON doc to
stdout; park it under tools/anchors/ and record the verdict in
SCALING.md + bench.py's attribution note.
"""
from __future__ import annotations

import json
import multiprocessing
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spin() -> None:
    x = 1.0000001
    while True:
        x = x * 1.0000001 + 1.0
        if x > 1e12:
            x = 1.0000001


def _run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True, text=True, env=env, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    burners = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    calm = _run_bench(sf_dir)
    procs = [multiprocessing.Process(target=_spin, daemon=True) for _ in range(burners)]
    for p in procs:
        p.start()
    time.sleep(3)  # let the load settle before the hot run's canary
    try:
        hot = _run_bench(sf_dir)
    finally:
        for p in procs:
            p.terminate()

    def norm(doc: dict, key: str, calm_ref: float) -> float | None:
        c = doc.get(key)
        return round(doc["value"] * calm_ref / c, 4) if c else None

    # normalize both runs against the CALM run's own canary readings, so
    # the agreement ratio is self-contained (no committed constant needed)
    cc, cio = calm["canary_sec"], calm["canary_io_sec"]
    report = {
        "burners": burners,
        "sf_dir": sf_dir,
        "calm": {k: calm[k] for k in ("value", "canary_sec", "canary_spread", "canary_io_sec")},
        "hot": {k: hot[k] for k in ("value", "canary_sec", "canary_spread", "canary_io_sec")},
        "raw_hot_over_calm": round(hot["value"] / calm["value"], 4),
        "canary_hot_over_calm": round(hot["canary_sec"] / cc, 4),
        "canary_io_hot_over_calm": round(hot["canary_io_sec"] / cio, 4),
        # agreement: hot total normalized by each canary vs the calm total —
        # 1.0 = the normalization fully explains the injected load
        "agreement_codegen_norm": round(
            (hot["value"] * cc / hot["canary_sec"]) / calm["value"], 4
        ),
        "agreement_io_norm": round(
            (hot["value"] * cio / hot["canary_io_sec"]) / calm["value"], 4
        ),
        "per_query_hot_over_calm": {
            q: round(hot["queries"][q] / calm["queries"][q], 3)
            for q in calm["queries"]
            if calm["queries"][q] > 0.3  # sub-noise rows excluded
        },
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
