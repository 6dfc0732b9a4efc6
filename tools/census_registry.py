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

r14 (VERDICT item 4): the census is now a CI gate —
``tests/test_census.py`` runs :func:`census` at sf0.001 and fails if
any query's residual exceeds its ``ALLOWANCES`` entry, so a future
operator change cannot silently re-introduce the r12 accumulation.

Usage: python tools/census_registry.py [sf_dir] [threshold]
Prints one JSON line per query with its residual growth, then a
summary listing queries above the threshold (default: 1).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

# Documented per-query residual allowances (r13 census, re-certified by
# the r14 gate). Default allowance is 1: the returned frame's own
# truncation leaf, caller-owned by convention. The positives above 1
# are CALLER-owned shared leaves the suite query materializes once and
# hands to several operator branches (releasing them inside any one
# branch would break the others), so they are bounded per CALL, not
# per-session accumulation:
#   dedup_ngram_jaccard      — the suite's shared PPJoin pair frame
#                              feeds both the pairs and groups branches
#                              (+ the output leaf) → up to 3
#   incremental_dedup_accepted — the replay owns the gen0 index leaf +
#                              two batch outputs across generations → 4
ALLOWANCES: dict[str, int] = {
    "dedup_ngram_jaccard": 3,
    "incremental_dedup_accepted": 4,
}
DEFAULT_ALLOWANCE = 1


def census(spark, sf_dir: str, emit=None) -> dict[str, object]:
    """Run every registered query once against ``sf_dir`` and return
    {query: residual RDD-storage growth} (str entries are errors).
    ``emit`` (optional callable) receives one dict per query as it
    completes — the CLI streams JSON lines through it."""
    import __spark_entry__ as e

    sc = spark.sparkContext

    def n_cached() -> int:
        return len(sc._jsc.sc().getRDDStorageInfo())

    out: dict[str, object] = {}
    for name, fn in e.queries().items():
        before = n_cached()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as ex:
            out[name] = f"ERR {type(ex).__name__}: {str(ex)[:160]}"
        else:
            growth = n_cached() - before
            # The census measures STRUCTURAL retention — blocks a
            # long-lived session would actually accumulate. Leaves whose
            # only remaining references are dead Python locals are
            # RECLAIMABLE: the ContextCleaner unpersists them once a
            # driver GC processes the weak refs (measured on
            # dedup_minhash_lsh: 4 calls grew storage 0→7 blocks, two
            # gc cycles later 0 — Spark's periodic-GC cleaner does this
            # in production every spark.cleaner.periodicGC.interval).
            # So on an over-allowance reading, run the same gc dance
            # (Python gc frees py4j handles → JVM gc enqueues weak refs
            # → cleaner unpersists, async) before believing it; a TRUE
            # structural leak (still strongly referenced) never shrinks,
            # so this cannot mask one.
            tries = 0
            while growth > ALLOWANCES.get(name, DEFAULT_ALLOWANCE) and tries < 4:
                import gc

                gc.collect()
                spark.sparkContext._jvm.System.gc()
                time.sleep(1.5)
                growth = n_cached() - before
                tries += 1
            out[name] = growth
        if emit is not None:
            emit({name: out[name]})
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_ALLOWANCE

    from etl_school_spark.session import get_spark

    spark = get_spark("census-registry")
    spark.range(1000).count()

    out = census(spark, sf_dir, emit=lambda d: print(json.dumps(d), flush=True))
    offenders = {
        k: v for k, v in out.items() if isinstance(v, int) and v > threshold
    }
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
