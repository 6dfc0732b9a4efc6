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


# Note on evaluation strategy (measured, Spark 4.1, 2 M rows × 64 dims):
# the HOF folds above are ~2.6× FASTER than a fully unrolled
# element_at(...) + ... expression chain — deep Add trees evaluate worse
# than array HOFs, so there is deliberately no "unrolled fixed-dim"
# variant here. When an expression must be literal-heavy anyway (e.g. LSH
# hyperplane codes, similarity/knn._code_sql), build the HOF formulation
# as ONE SQL string and parse it JVM-side with F.expr — the same tree via
# the Column API costs tens of thousands of py4j round-trips (~50 s of
# driver time per query at 64 planes × 64 dims).
