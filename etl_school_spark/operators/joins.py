"""Joins (SURVEY.md §2.3, J1–J4).

Scale posture: dimension joins broadcast the small side (no shuffle of the
fact table — at 100 TB the fact side never moves); scalar-stats "cross
joins" (J2/J3) broadcast a 1-row aggregate, which AQE does automatically
once the agg result is known to be tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """J4: fact ⋈ small-dimension lookup with an explicit broadcast hint
    (reference does this generator-side by name-equality lookup,
    data_generator.py:34-37; first-match-else-NULL ≡ left outer)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def scalar_stats_join(df: DataFrame, stats: DataFrame) -> DataFrame:
    """J2/J3: every row × 1-row stats relation (A4:762-769 ``from t, stats``).

    The stats side is an aggregate of the same relation; crossJoin of a
    1-row frame broadcasts and adds no shuffle.
    """
    return df.crossJoin(F.broadcast(stats))


def three_sigma_outliers(df: DataFrame, col: str) -> DataFrame:
    """J2+A5: rows where ``col`` is outside mean ± 3·stddev (A4:762-769)."""
    stats = df.agg(
        F.avg(F.col(col)).alias("_mu"),
        F.stddev(F.col(col)).alias("_sigma"),
    )
    joined = scalar_stats_join(df, stats)
    out = joined.filter(
        (F.col(col) > F.col("_mu") + 3 * F.col("_sigma"))
        | (F.col(col) < F.col("_mu") - 3 * F.col("_sigma"))
    )
    return out.drop("_mu", "_sigma")
