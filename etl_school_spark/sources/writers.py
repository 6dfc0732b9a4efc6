"""Batch writers / load jobs (SURVEY.md §2.1 S7/S8/S18).

``copy_into`` reproduces the reference's stage→table load contract
(batch_insert.py:66-73): load every staged file matching a pattern into the
target (name-based column resolution), then purge consumed files so the
load is idempotent under re-runs. At cluster scale the "table" is a
directory-backed table (or catalog table) and the append is a metadata-only
file move for parquet-to-parquet loads.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from etl_school_spark.sources.readers import read_stage, split_corrupt


def write_parquet(df: DataFrame, path: str, mode: str = "append") -> None:
    """S7: Parquet with snappy — the reference's transport format
    (batch_insert.py:62-64 disables dictionary encoding for Snowflake
    compatibility; Spark's default dictionary encoding is kept here, it is
    strictly better for scans)."""
    df.write.mode(mode).parquet(path, compression="snappy")


def copy_into(
    spark: SparkSession,
    stage_dir: str,
    target_dir: str,
    schema: StructType,
    fmt: str = "json",
    pattern: str | None = None,
    purge: bool = True,
) -> int:
    """S8/S11: load staged files into the target table dir, then purge.

    Returns the number of rows loaded. Corrupt rows are diverted to
    ``<target_dir>__rejects`` rather than failing the load.
    """
    staged = read_stage(spark, stage_dir, schema, fmt=fmt, pattern=pattern)
    good, bad = split_corrupt(staged) if fmt == "json" else (staged, None)
    n = good.count()
    if n:
        write_parquet(good, target_dir)
    if bad is not None and not bad.isEmpty():
        bad.write.mode("append").json(target_dir + "__rejects")
    if purge:
        pat = pattern or "*"
        for f in glob.glob(os.path.join(stage_dir, pat)):
            os.remove(f)
    return n


def export_csv(df: DataFrame, path: str | None = None, limit: int | None = None) -> str:
    """S18: CSV export of a (filtered) preview (A5:344-350).

    With ``path`` → distributed CSV write; without → driver-side string
    (the dashboard download path, bounded by ``limit``).
    """
    if path is not None:
        df.write.mode("overwrite").option("header", True).csv(path)
        return path
    pdf = (df.limit(limit) if limit else df).toPandas()
    return pdf.to_csv(index=False)
