"""etl_school_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference project (YassLeMaudit/ETL-School, surveyed in SURVEY.md),
re-expressed idiomatically on Apache Spark: DataFrame/SQL (Catalyst) for the
relational surface, Structured Streaming for ingest/broker/CDC surfaces,
plus large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing).

Design stance (SURVEY.md §7):
- Everything is a lazy DataFrame plan; no driver-side collects in the data
  path. Catalyst gets full visibility for pushdown/pruning/join selection.
- Small dimensions are broadcast; big joins/aggs rely on AQE + tuned
  shuffle partitioning; skew handled by AQE skew-join.
- Python UDFs only where built-ins genuinely can't express the semantics,
  and then always Arrow-batched (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"

from etl_school_spark.session import get_spark  # noqa: F401
from etl_school_spark.tables import load_table, register_views  # noqa: F401
