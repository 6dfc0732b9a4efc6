"""Vector math over array<float> embedding columns, as pure Catalyst
expressions (sequential left-fold — deterministic, engine-portable,
whole-stage-codegen'd; no Python in the data path).

All arithmetic is done in float64 after casting each element, with a
sequential in-order fold: the result is bit-reproducible across runs,
partitionings, and engines that use the same evaluation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column | str) -> Column:
    a = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(a, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs are cast element-wise to double first."""
    da, db = as_double(a), as_double(b)
    return dot(da, db) / (l2_norm(da) * l2_norm(db))


# -- fixed-dimension variants -------------------------------------------------
# Higher-order-function lambdas (transform/aggregate) are evaluated
# INTERPRETED per element in Spark — fine for one pass over a corpus,
# painful when a verify stage scores millions of candidate pairs. When the
# embedding dimension is statically known, an unrolled element_at chain
# stays inside whole-stage codegen, much faster per row, and sums in the
# same left-to-right order as the folds above (plus the fold's
# 0.0 + x1 == x1 exactly), so scores are BIT-IDENTICAL to the generic
# versions — the DuckDB oracles need no change.
#
# These take column NAMES and build ONE SQL string parsed JVM-side via
# F.expr: constructing the same unrolled tree through the Column API costs
# tens of thousands of py4j round-trips (measured ~50 s of pure driver
# time for a 4096-term expression), while expr() parses it in one call.


def _term_sql(a: str, b: str, i: int) -> str:
    return f"(CAST(element_at({a}, {i}) AS DOUBLE) * CAST(element_at({b}, {i}) AS DOUBLE))"


def dot_fixed_sql(a: str, b: str, dim: int) -> str:
    """SQL text of the unrolled dot product of two ``dim``-length array
    columns (referenced by name); + is left-associative, so the summation
    order matches ``dot``'s sequential fold exactly."""
    return " + ".join(_term_sql(a, b, i) for i in range(1, dim + 1))


def l2_norm_fixed_sql(a: str, dim: int) -> str:
    return "SQRT(" + " + ".join(_term_sql(a, a, i) for i in range(1, dim + 1)) + ")"


def dot_fixed(a: str, b: str, dim: int) -> Column:
    """Unrolled dot product over double-cast elements of two ``dim``-length
    array columns; bit-identical to ``dot(as_double(a), as_double(b))``."""
    return F.expr(dot_fixed_sql(a, b, dim))


def l2_norm_fixed(a: str, dim: int) -> Column:
    return F.expr(l2_norm_fixed_sql(a, dim))


def cosine_fixed(a: str, b: str, dim: int) -> Column:
    """Cosine similarity with a statically known dimension — bit-identical
    to ``cosine`` (same summation order), whole-stage-codegen'd."""
    return F.expr(
        f"({dot_fixed_sql(a, b, dim)}) / ({l2_norm_fixed_sql(a, dim)} * {l2_norm_fixed_sql(b, dim)})"
    )
