"""Window functions (SURVEY.md §2.5, W1–W3).

W3 (Snowflake QUALIFY, A4:902-907) has no Spark SQL keyword; the canonical
rewrite is window + filter, which Catalyst executes identically (a single
window exec over shuffled-by-partition-key data, then a cheap filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list,
    keep: int = 1,
) -> DataFrame:
    """W2/W3: latest-N-per-group via row_number + filter (A4:824-833).

    ``order_cols`` should define a total order (include a unique tiebreak
    column) so the result is deterministic across engines and runs.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= keep)
        .drop("_rn")
    )
