"""Physical layout operators: bucketing and skew salting (100 TB posture).

Two shuffle-elimination techniques the DataFrame API can't express as a
single call:

- **Bucketed co-located joins**: write both join sides bucketed on the
  join key; Spark's scan exposes the bucketing as an output partitioning
  and the sort-merge join runs with NO Exchange on either side. At 100 TB
  this converts the dominant fact⋈fact shuffle into local merges.
- **Salted joins / aggregations**: a skewed key (one customer with 10⁹
  rows) overloads a single reducer. Salting splits each hot key into N
  sub-keys: the fact side gets a deterministic salt, the dim side is
  exploded N× (dim rows are small), and the join/agg runs on
  (key, salt) — N-way parallel. AQE's skew-join handles moderate skew
  automatically; salting is the explicit tool for pathological keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Joins between tables bucketed on the same key with the same bucket
    count skip the shuffle entirely; sorting within buckets also skips
    the merge-join sort.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — shuffle-free by layout."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Cluster-by write: range-repartition on the cluster key, sort rows
    within each output file. Parquet then stores tight per-row-group
    min/max statistics on the key, so point/range scans skip whole files
    and row groups (data skipping) — the plain-parquet version of
    Delta/Iceberg ORDER BY clustering, and the #1 cheap scan optimization
    at 100 TB after partitioning.
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def salt_column(unique_col: str | Column, n: int) -> Column:
    """Deterministic salt in [0, n) from a unique column — reproducible
    across runs/retries (rand() would break exactly-once retries)."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    unique_col: str,
    n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on a skewed ``key``: fact rows get a deterministic salt
    from ``unique_col``; every dim row is replicated to all N salts, so
    each (key, salt) reducer holds ~1/N of the hot key's rows."""
    salted_fact = fact.withColumn("_salt", salt_column(unique_col, n))
    salted_dim = dim.withColumn("_salt", F.explode(F.lit(list(range(n)))))
    out = salted_fact.join(salted_dim, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    unique_col: str,
    aggs: dict[str, str],
    n: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys, for algebraic
    aggregates (``aggs`` maps column → 'sum'|'count'|'min'|'max'):
    partial agg on (keys, salt), final agg on keys. The hot key's rows
    hit N reducers in phase 1; phase 2 merges N partials per key.
    """
    partial_exprs, final_exprs = [], []
    for col, fn in aggs.items():
        a = f"_{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(a))
            final_exprs.append(F.sum(a).alias(f"{fn}_{col}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(a))
            final_exprs.append(F.sum(a).alias(f"{fn}_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(a))
            final_exprs.append(F.min(a).alias(f"{fn}_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(a))
            final_exprs.append(F.max(a).alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = df.withColumn("_salt", salt_column(unique_col, n))
    partial = salted.groupBy(*group_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*group_cols).agg(*final_exprs)
