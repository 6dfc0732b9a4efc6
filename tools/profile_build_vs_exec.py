"""Per-query split of warm wall time into CONSTRUCTION (the qs[name]()
call — Catalyst analysis, toRdd planning at each lazy checkpoint, and
any blocking driver jobs such as eager leaves / dispatch probes) vs the
final noop ACTION — the r15 instrument for VERDICT item 2 (56% of warm
wall time was attributed to serial query construction in r14).

Usage: python tools/profile_build_vs_exec.py [sf_dir] [--iters N] [query ...]
Defaults: sf_dir=/root/testdata/sf0.1, iters=3, queries=bench HEADLINE.
One session; per-query median over iters after one warm pass.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    iters = 3
    pos: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--iters":
            iters, i = int(argv[i + 1]), i + 2
        else:
            pos.append(argv[i])
            i += 1
    sf_dir = pos[0] if pos and os.path.isdir(pos[0]) else "/root/testdata/sf0.1"
    only = pos[1:] if pos and os.path.isdir(pos[0]) else pos

    import __spark_entry__ as e
    from bench import HEADLINE
    from etl_school_spark.session import get_spark

    spark = get_spark("profile-build-vs-exec")
    qs = e.queries()
    names = [n for n in (only or HEADLINE) if n in qs]
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).limit(1).collect()

    # warm pass (cold costs excluded, like bench.py)
    for n in names:
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    samples = {n: {"build": [], "exec": []} for n in names}
    for _ in range(iters):
        for n in names:
            t0 = time.time()
            df = qs[n](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            samples[n]["build"].append(t1 - t0)
            samples[n]["exec"].append(t2 - t1)
    for n in names:
        b = round(statistics.median(samples[n]["build"]), 4)
        x = round(statistics.median(samples[n]["exec"]), 4)
        out[n] = {
            "build": b,
            "exec": x,
            "total": round(b + x, 4),
            "build_frac": round(b / (b + x), 3) if b + x > 0 else None,
        }
        print(json.dumps({"q": n, **out[n]}), flush=True)
    tb = round(sum(v["build"] for v in out.values()), 3)
    tx = round(sum(v["exec"] for v in out.values()), 3)
    print(json.dumps({
        "metric": "build_vs_exec", "sf_dir": sf_dir, "iters": iters,
        "total_build": tb, "total_exec": tx,
        "build_frac": round(tb / (tb + tx), 3),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
