"""Full-registry scaling sweep: run EVERY registered query once (cold,
noop sink) against a scale directory and print per-query wall times plus
a total — the repo's standard sf1 spot-check (SCALING.md records each
round's results).

This sweep is the measurement that gates physical-form changes: sf0.1
benching alone accepted two r8 candidate "optimizations" that the sf1
run rejected (a groupBy-array pair expansion that never finished on
16k-member buckets, and an expression-side bigram pairing ~2.7x slower
once data dominated). Run it after any operator-shape change.

Usage: python tools/sweep_sf1.py [sf_dir]
Default sf_dir: /root/repo/.sf1 (build it with tools/make_sf1.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"

    import __spark_entry__ as e
    from etl_school_spark.session import get_spark

    spark = get_spark("etl-school-spark-sf1-sweep")
    spark.range(1000).count()  # JVM warm-up outside any query's clock
    # host-drift canary pair, shared definition with bench.py (r10 —
    # previously hand-mirrored): sweep totals on this machine vary ±30%
    # between back-to-back runs of identical code — print the canaries
    # so cross-round sweep comparisons can tell host noise from real
    # regressions (rationale in etl_school_spark/canary.py)
    from etl_school_spark.canary import run_canaries

    print(json.dumps(run_canaries(spark, sf_dir)), flush=True)
    out: dict[str, object] = {}
    for name, fn in e.queries().items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 2)
        except Exception as ex:  # keep sweeping — errors are the headline
            out[name] = f"ERR {type(ex).__name__}: {str(ex)[:200]}"
        print(json.dumps({name: out[name]}), flush=True)
    errs = sum(1 for v in out.values() if isinstance(v, str))
    total = round(sum(v for v in out.values() if isinstance(v, float)), 1)
    print("TOTAL", total, "errors", errs, flush=True)
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
