"""Deterministic sampling / splitting for training-data pipelines.

``sample()``/``sampleBy()`` draw per-partition pseudo-random numbers, so
results change with partitioning and retries. Pipelines need the
opposite: membership decided by a pure function of the ROW KEY, so any
engine, any partitioning, any retry yields the same sample, and
train/test never leak rows across re-runs.

Mechanism: compare a fixed-width hex prefix of md5(key) against a
threshold. md5 is identical everywhere (vs xxhash64, which is
Spark-private), string comparison avoids integer-conversion dialect
differences, and 4 hex chars give 1/65536 granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WIDTH = 4  # hex chars → 16-bit buckets
_BUCKETS = 16**_WIDTH


def hash_bucket(key: Column | str) -> Column:
    """The row's sampling coordinate: first 4 hex chars of md5(key)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, _WIDTH)


def threshold_hex(fraction: float) -> str:
    """Hex threshold t such that P(bucket < t) ≈ fraction (exact:
    floor(fraction·65536)/65536)."""
    return format(max(0, min(_BUCKETS, round(fraction * _BUCKETS))), f"0{_WIDTH}x")


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ≈``fraction`` of rows, membership a pure function of ``key``."""
    return df.filter(hash_bucket(key) < F.lit(threshold_hex(fraction)))


def train_test_split(df: DataFrame, key: str, train_fraction: float = 0.9) -> DataFrame:
    """Assign a stable 'train'/'test' split column keyed on ``key``."""
    return df.withColumn(
        "split",
        F.when(hash_bucket(key) < F.lit(threshold_hex(train_fraction)), "train").otherwise(
            "test"
        ),
    )


def quota_sample(df: DataFrame, key: str, class_col: str, fractions: dict[str, float]) -> DataFrame:
    """Class-rebalancing sample: keep a different deterministic fraction
    per class (e.g. downsample the dominant language, keep all of the
    rare ones). Classes absent from ``fractions`` are dropped. Membership
    is still a pure function of (key), so rebalanced corpora are
    reproducible."""
    expr = None
    for cls, frac in fractions.items():
        cond = (F.col(class_col) == cls) & (hash_bucket(key) < F.lit(threshold_hex(frac)))
        expr = cond if expr is None else (expr | cond)
    return df.filter(expr)
