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


def threshold_hex(fraction: float) -> str | None:
    """Hex threshold t such that P(bucket < t) ≈ fraction (exact:
    floor(fraction·65536)/65536).

    Returns ``None`` for fraction >= 1, meaning "keep everything": no
    4-hex-char threshold can admit the max bucket 'ffff' (a 5-char
    '10000' compares LOWER than 'ffff' lexicographically and would keep
    only ~1/16 of rows). Sub-1 fractions that round up to 65536 cap at
    'ffff' (P = 65535/65536)."""
    if fraction >= 1:
        return None
    return format(max(0, min(_BUCKETS - 1, round(fraction * _BUCKETS))), f"0{_WIDTH}x")


def keep_condition(key: Column | str, fraction: float) -> Column:
    """Boolean membership column for a deterministic ``fraction`` sample."""
    t = threshold_hex(fraction)
    if t is None:
        return F.lit(True)
    return hash_bucket(key) < F.lit(t)


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ≈``fraction`` of rows, membership a pure function of ``key``."""
    return df.filter(keep_condition(key, fraction))


def train_test_split(df: DataFrame, key: str, train_fraction: float = 0.9) -> DataFrame:
    """Assign a stable 'train'/'test' split column keyed on ``key``."""
    return df.withColumn(
        "split",
        F.when(keep_condition(key, train_fraction), "train").otherwise("test"),
    )


def quota_sample(df: DataFrame, key: str, class_col: str, fractions: dict[str, float]) -> DataFrame:
    """Class-rebalancing sample: keep a different deterministic fraction
    per class (e.g. downsample the dominant language, keep all of the
    rare ones). Classes absent from ``fractions`` are dropped. Membership
    is still a pure function of (key), so rebalanced corpora are
    reproducible."""
    expr = None
    for cls, frac in fractions.items():
        cond = (F.col(class_col) == cls) & keep_condition(key, frac)
        expr = cond if expr is None else (expr | cond)
    return df.filter(expr)
