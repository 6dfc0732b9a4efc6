"""Sorts / limits / top-K (SURVEY.md §2.6, O1–O4).

`orderBy(...).limit(k)` compiles to TakeOrderedAndProject — a true
distributed top-K (per-partition heap + driver merge), never a full sort
of the relation. This is the plan the A5 dashboard's top-N panels need at
scale (streamlit_buy_orders_app.py:154-163).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def top_k(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """O1: top-K with a total order (pass a unique tiebreak column)."""
    return df.orderBy(*order_cols).limit(k)
