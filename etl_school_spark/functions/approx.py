"""Approximate aggregates — the 100 TB alternatives to exact
COUNT(DISTINCT) and exact percentiles.

The registered queries keep EXACT forms (`countDistinct`,
`percentile`) because the DuckDB oracle demands bit-stable answers
(COVERAGE.md §2.4 A6, stats_profile_suite). At cluster scale those
exact forms have a cost shape worth avoiding: exact distinct-count
shuffles every distinct value and exact percentile shuffles every row
to a sort. These wrappers expose Spark's mergeable-sketch versions —
HyperLogLog++ (`approx_count_distinct`) and the Greenwald-Khanna /
t-digest-style `percentile_approx` — whose state is O(sketch) per
partition and merges associatively in the partial-aggregation step, so
the shuffle carries kilobytes instead of the data.

Error contracts (asserted in tests/test_operators.py):
- HLL++: relative standard deviation ``rsd`` (default 5%);
- percentile_approx: rank error bounded by 1/``accuracy``.

Both are deterministic for a fixed input dataset (sketches have no RNG),
so pipelines using them stay reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_count_distinct(col: Column | str, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count with relative standard deviation
    ``rsd``. Mergeable sketch — partial aggregation carries O(1/rsd²)
    bytes per group, not the distinct values."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(
    col: Column | str, probabilities: list[float], accuracy: int = 10_000
) -> Column:
    """Approximate quantiles with rank error ≤ 1/``accuracy``. One pass,
    mergeable summaries — no global sort."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(
        c, F.array(*[F.lit(float(p)) for p in probabilities]), F.lit(accuracy)
    )


def cardinality_profile(
    df: DataFrame, cols: list[str], rsd: float = 0.05
) -> DataFrame:
    """Distinct-cardinality profile of ``cols`` in ONE pass (one row out:
    col → approx distinct count) — the scan-once schema-profiling shape;
    an exact profile would need a shuffle per column."""
    aggs = [hll_count_distinct(c, rsd).alias(c) for c in cols]
    wide = df.agg(*aggs)
    return wide.unpivot([], cols, "column", "approx_distinct")
