"""Set operations (SURVEY.md §2.7, U1–U3)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def labelled_counts(parts: dict[str, DataFrame]) -> DataFrame:
    """U1/U2: N-way UNION ALL of labelled counts (A4:480-486 pipeline-stage
    dashboard). Each leg is an independent count; the union is by name."""
    frames = [
        df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(label).alias("stage"), F.col("n_rows")
        )
        for label, df in parts.items()
    ]
    return reduce(DataFrame.unionByName, frames)


def values_table(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """U3: inline VALUES relation (A4:909-915 thresholds)."""
    return spark.createDataFrame(rows, schema=schema)
