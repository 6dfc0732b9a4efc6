"""Registry-wide storage-leak census (r13 self-review, following the
dedup leaf-release work): run EVERY registered query once and report
how many cached/checkpointed RDD block sets each one leaves behind
after its result is consumed and dropped.

The r12 ADVICE found the dedup quotient accumulating O(star-edges)
blocks per call; this sweep asks the same question of the other 45
registered queries. A query that retains its returned frame's OWN
truncation leaf reads as +1 (the caller-owned convention — bounded);
anything above that is working state the operator failed to release
and would accumulate per query in a long-lived session (the 100 TB
posture: one SparkSession serving many queries).

Usage: python tools/census_registry.py [sf_dir] [threshold]
Prints one JSON line per query with its residual growth, then a
summary listing queries above the threshold (default: 1).
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import __spark_entry__ as e
    from etl_school_spark.session import get_spark

    spark = get_spark("census-registry")
    sc = spark.sparkContext
    spark.range(1000).count()

    def n_cached() -> int:
        return len(sc._jsc.sc().getRDDStorageInfo())

    offenders: dict[str, int] = {}
    out: dict[str, object] = {}
    for name, fn in e.queries().items():
        before = n_cached()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as ex:
            out[name] = f"ERR {type(ex).__name__}: {str(ex)[:160]}"
            print(json.dumps({name: out[name]}), flush=True)
            continue
        growth = n_cached() - before
        out[name] = growth
        if growth > threshold:
            offenders[name] = growth
        print(json.dumps({name: growth}), flush=True)
    print(json.dumps({
        "total_residual": sum(v for v in out.values() if isinstance(v, int)),
        "errors": sum(1 for v in out.values() if isinstance(v, str)),
        "over_threshold": offenders,
        "threshold": threshold,
    }), flush=True)
    spark.stop()
    return 1 if offenders else 0


if __name__ == "__main__":
    raise SystemExit(main())
