"""Idle-host canary census (r14, VERDICT item 1): re-derive the calm
canary band from the CURRENT host instead of the stale r9–r11 one.

The r13 contradiction this resolves: the committed calm band
(0.20–0.23, from r9–r11 medians) no longer describes the host — r13's
close canaries idled at 0.10–0.13, so the only window-stable sf1 sweep
read "out of band" while the in-band reading was window-refused. A
band constant is only meaningful relative to a fresh idle census of
the machine that will be measured.

Method: one long-lived session samples the shared canary pair
(etl_school_spark/canary.py — 9-sample codegen median + 5-sample scan
median per call) ``--samples`` times, ``--sleep`` seconds apart, so
the census spans minutes of wall clock rather than one instant. The
summary reports min/p10/median/p90/max over the per-call medians and a
suggested band = [p10 × 0.9, p90 × 1.1] — wide enough that ordinary
idle jitter stays in-band, tight enough that the ×1.2+ contention the
refusal gates exist for reads OUT of band.

Run this ONLY on an otherwise-idle host (it is measuring idle).

Usage: python tools/idle_canary_census.py [--samples N] [--sleep S] [sf_dir]
Prints one JSON line per sample, then one summary JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _q(sorted_vals: list[float], frac: float) -> float:
    i = min(len(sorted_vals) - 1, max(0, round(frac * (len(sorted_vals) - 1))))
    return sorted_vals[i]


def main() -> int:
    args = sys.argv[1:]
    samples, sleep_s, sf_dir = 10, 15.0, "/root/testdata/sf0.1"
    i = 0
    while i < len(args):
        if args[i] == "--samples":
            samples, i = int(args[i + 1]), i + 2
        elif args[i] == "--sleep":
            sleep_s, i = float(args[i + 1]), i + 2
        else:
            sf_dir, i = args[i], i + 1

    from etl_school_spark.canary import run_canaries
    from etl_school_spark.session import get_spark

    spark = get_spark("idle-canary-census")
    spark.range(1000).count()

    cg: list[float] = []
    io: list[float] = []
    for k in range(samples):
        c = run_canaries(spark, sf_dir)
        cg.append(c["canary_sec"])
        io.append(c["canary_io_sec"])
        print(json.dumps({"sample": k, **c}), flush=True)
        if k < samples - 1:
            time.sleep(sleep_s)
    cg.sort()
    io.sort()
    band = (round(_q(cg, 0.10) * 0.9, 4), round(_q(cg, 0.90) * 1.1, 4))
    print(json.dumps({
        "samples": samples,
        "sleep_sec": sleep_s,
        "codegen": {
            "min": cg[0], "p10": _q(cg, 0.10), "median": _q(cg, 0.50),
            "p90": _q(cg, 0.90), "max": cg[-1],
        },
        "io": {
            "min": io[0], "p10": _q(io, 0.10), "median": _q(io, 0.50),
            "p90": _q(io, 0.90), "max": io[-1],
        },
        "suggested_calm_band": band,
    }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
