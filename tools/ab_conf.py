"""Same-SESSION A/B of runtime-settable SQL confs over the headline set.

The strongest evidence tier in the repo's trust order is same-session
interleaving: one JVM, one page cache, variants alternated per pass so
host drift cancels. This tool runs the bench HEADLINE queries under two
conf dicts (A = session defaults, B = candidate overrides), alternating
A/B per pass, and reports per-query medians + B/A ratios.

Only works for confs that are runtime-settable (`spark.conf.set`) and
read at planning time — join strategy and AQE knobs qualify; core
`spark.io.*` / serializer confs do NOT (use ab_rounds.py with a
session.py change for those).

Usage:
  python tools/ab_conf.py --set k=v [--set k=v ...] [--iters N]
                          [--sf-dir D] [--out PATH] [query ...]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", action="append", default=[], dest="confs",
                    help="k=v conf override for the B side")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    overrides = dict(kv.split("=", 1) for kv in args.confs)
    if not overrides:
        ap.error("need at least one --set k=v")

    import __spark_entry__ as e
    from bench import HEADLINE
    from etl_school_spark.session import get_spark

    spark = get_spark("ab-conf")
    qs = e.queries()
    names = args.queries or [n for n in HEADLINE if n in qs]
    spark.read.parquet(os.path.join(args.sf_dir, "region.parquet")).limit(1).collect()
    defaults = {k: spark.conf.get(k, None) for k in overrides}

    def apply(side: str) -> None:
        src = overrides if side == "B" else defaults
        for k, v in src.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # one untimed warm pass per side (codegen for both plan shapes)
    for side in ("A", "B"):
        apply(side)
        for n in names:
            qs[n](spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    runs: dict[str, dict[str, list[float]]] = {n: {"A": [], "B": []} for n in names}
    order = []
    for i in range(args.iters):
        # alternate which side leads each pass so drift cancels
        sides = ("A", "B") if i % 2 == 0 else ("B", "A")
        for side in sides:
            apply(side)
            order.append(side)
            for n in names:
                t0 = time.time()
                qs[n](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                runs[n][side].append(round(time.time() - t0, 4))

    out: dict = {"overrides": overrides, "iters": args.iters, "order": order,
                 "sf_dir": args.sf_dir, "queries": {}}
    ratios = []
    ta = tb = 0.0
    for n in names:
        ma = statistics.median(runs[n]["A"])
        mb = statistics.median(runs[n]["B"])
        ta += ma
        tb += mb
        ratios.append(mb / ma if ma else float("nan"))
        out["queries"][n] = {"A": runs[n]["A"], "B": runs[n]["B"],
                             "median_A": round(ma, 4), "median_B": round(mb, 4),
                             "ratio": round(mb / ma, 4) if ma else None}
    out["total_A"] = round(ta, 4)
    out["total_B"] = round(tb, 4)
    out["total_ratio"] = round(tb / ta, 4) if ta else None
    out["median_query_ratio"] = round(statistics.median(ratios), 4)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
