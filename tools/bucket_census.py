"""Run the blocking-bucket skew census (dedup/census.py) against a
scale directory and print one JSON line per operator — the numbers
SCALING.md records per round.

Usage: python tools/bucket_census.py [sf_dir ...]
Default: /root/testdata/sf0.1 and /root/repo/.sf1 (if present).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    dirs = sys.argv[1:] or [
        d for d in ("/root/testdata/sf0.1", "/root/repo/.sf1") if os.path.isdir(d)
    ]

    from etl_school_spark.dedup.census import (
        minhash_census,
        semantic_census,
        simhash_census,
    )
    from etl_school_spark.session import get_spark
    from etl_school_spark.tables import fan_out, load_table

    spark = get_spark("etl-school-spark-census")
    for sf_dir in dirs:
        docs = fan_out(load_table(spark, sf_dir, "documents"))
        for name, fn in (("simhash", simhash_census), ("minhash", minhash_census)):
            print(
                json.dumps({"sf_dir": sf_dir, "operator": name, **fn(docs)}),
                flush=True,
            )
        embs = fan_out(load_table(spark, sf_dir, "embeddings"))
        print(
            json.dumps(
                {"sf_dir": sf_dir, "operator": "semantic", **semantic_census(embs)}
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
