"""Catalog access for the driver's TPC-H-ish parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings. One parquet file per table under an sf dir.

`events.ts` is stored as parquet TIMESTAMP(NANOS, isAdjustedToUTC=false),
which Spark's reader rejects; we read it as long (legacy.parquet.nanosAsLong)
and rebuild a TIMESTAMP_NTZ from epoch micros. The reconstruction is done in
NTZ space (timestampadd on an NTZ literal) so it is independent of the
session time zone and matches DuckDB's micro-precision view of the column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_school_spark.session import ensure_engine_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions that should always be broadcast when joined against a
# fact table. At 100 TB these stay O(KB-MB) while facts scale, so a
# broadcast-hash join (no shuffle of the fact side) is the right plan.
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    return df


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Restore parallelism after a scan of few-row-group files, for
    pipelines whose PRE-shuffle work is expensive (hyperplane codes,
    shingling, md5 signatures, bucket-join expansion).

    Spark parallelizes scans by splitting files at row-group boundaries;
    the test tables are single-row-group parquet, so every scan yields ONE
    partition and everything before the first shuffle runs on one core
    (measured: the near-dup bucket join spent 10 s expanding 12 M rows on
    one thread at sf0.1). At 100 TB scans split naturally into thousands
    of partitions and this helper returns the frame UNCHANGED — the
    round-robin shuffle is applied only when the scan is narrower than the
    cluster's parallelism, where it is a skinny one-time cost. Row order
    is not semantically meaningful to any caller (all registered queries
    end in an explicit sort), and round-robin repartition is
    retry-deterministic (Spark sorts within partitions before dealing)."""
    if df.isStreaming:
        # streaming frames have no static partition count to inspect and
        # micro-batch parallelism is the trigger's concern — pass through
        # so batch/stream-shared operators can apply the guard blindly
        return df
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view for spark.sql use."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
