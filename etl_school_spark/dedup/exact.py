"""Exact deduplication: hash-groupBy on a content fingerprint.

Scale shape: one shuffle on the fingerprint (map-side partial agg applies),
group sizes are tiny, no skew unless the corpus contains a mega-duplicate —
which AQE skew handling absorbs. This is the reference's
``SELECT DISTINCT *`` dedup (commands.sql:126-128) generalized to
content-hash identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_school_spark.functions.text import fingerprint


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct content fingerprint: the canonical (minimum) id,
    the duplicate-group size, and the fingerprint itself.

    Downstream, keeping ``canonical_id`` rows implements dedup; group_n > 1
    rows are the duplicates report.
    """
    from etl_school_spark.tables import fan_out

    return (
        fan_out(docs)  # md5 scan is pre-shuffle work; no-op when parallel
        .select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("group_n"),
        )
    )


def drop_exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Return docs with only the canonical row per fingerprint retained."""
    canon = exact_dedup_groups(docs, id_col, text_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return docs.join(canon, id_col, "left_semi")
