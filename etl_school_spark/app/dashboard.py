"""Interactive-analytics query API — the A5 Streamlit/Snowpark dashboard's
query surface re-expressed over PySpark (SURVEY.md §3.3).

Same lifecycle as the reference: build ONE lazy filtered plan, then derive
every panel (metrics, top-N breakdowns, preview, export) from it — Catalyst
pushes the shared filters/pruning into each derived plan, and the base plan
can be cached for the session (A5's cache_resource/cache_data ≈
df.persist + app-level memo).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_school_spark.operators.aggregates import dsum
from etl_school_spark.operators.projections import multi_column_search
from etl_school_spark.operators.sorts import top_k
from etl_school_spark.sources.writers import export_csv


class Dashboard:
    """Filterable analytics over a fact table (A5:18-117)."""

    def __init__(self, df: DataFrame, measure_col: str, searchable_cols: list[str]):
        self.base = df
        self.measure = measure_col
        self.searchable = searchable_cols
        self._filters: list = []

    # -- filter builders (A5:72-112) ---------------------------------------
    def filter_isin(self, col: str, values: list) -> "Dashboard":
        if values:
            self._filters.append(F.col(col).isin(values))
        return self

    def filter_range(self, col: str, lo=None, hi=None) -> "Dashboard":
        if lo is not None:
            self._filters.append(F.col(col) >= lo)
        if hi is not None:
            self._filters.append(F.col(col) <= hi)
        return self

    def filter_time(self, col: str, start: str | None, end_exclusive: str | None) -> "Dashboard":
        if start:
            self._filters.append(F.col(col) >= F.to_timestamp(F.lit(start)).cast("timestamp_ntz"))
        if end_exclusive:
            self._filters.append(F.col(col) < F.to_timestamp(F.lit(end_exclusive)).cast("timestamp_ntz"))
        return self

    def search(self, query: str) -> "Dashboard":
        if query:
            self._filters.append(F.lit(False))  # replaced below by OR chain
            self._filters[-1] = reduce(
                lambda a, b: a | b, [F.col(c).ilike(f"%{query}%") for c in self.searchable]
            )
        return self

    def filtered(self) -> DataFrame:
        df = self.base
        for f in self._filters:
            df = df.filter(f)
        return df

    # -- panels (A5:130-163, 227-260) ---------------------------------------
    def filter_options(self, col: str) -> list:
        """Distinct sorted values for a filter widget (A5:51-57)."""
        return [r[0] for r in self.base.select(col).distinct().orderBy(col).collect()]

    def metrics(self) -> dict:
        """Headline stat tiles: row count, measure sum/avg, distinct keys."""
        row = self.filtered().agg(
            F.count(F.lit(1)).alias("n"),
            dsum(self.measure).alias("total"),
            (dsum(self.measure) / F.count(F.lit(1))).alias("avg"),
        ).collect()[0]
        return {"rows": row.n, "total": row.total, "avg": row.avg}

    def top_breakdown(self, by: str, n: int = 10) -> DataFrame:
        agged = self.filtered().groupBy(by).agg(
            F.count(F.lit(1)).alias("n"), dsum(self.measure).alias("total")
        )
        return top_k(agged, [F.desc("n"), by], n)

    def preview(self, columns: list[str] | None = None, limit: int = 100) -> DataFrame:
        df = self.filtered()
        if columns:
            df = df.select(*columns)
        return df.limit(limit)

    def export(self, columns: list[str] | None = None, limit: int = 10000) -> str:
        return export_csv(self.preview(columns, limit))
