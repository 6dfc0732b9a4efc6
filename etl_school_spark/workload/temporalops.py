"""Temporal-join workload: as-of and interval range joins, checked
against DuckDB's NATIVE ASOF JOIN / inequality join — the engine's
composition must reproduce the reference semantics exactly.

Both sides of each join derive deterministically from the events table
so the oracle can rebuild identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_school_spark.operators.temporal import asof_join, interval_range_join
from etl_school_spark.tables import load_table

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_q(
    "asof_user_tier",
    """
    SELECT e.event_id, e.user_id, t.tier
    FROM events e
    ASOF LEFT JOIN (
      SELECT user_id, ts, event_id % 5 AS tier
      FROM events WHERE event_id % 20 = 0
    ) t ON e.user_id = t.user_id AND e.ts >= t.ts
    ORDER BY e.event_id
    """,
)
def asof_user_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event annotated with the user's tier as of that moment —
    tier changes are a sparse per-user change log (every 20th event)."""
    events = load_table(spark, sf_dir, "events")
    tiers = events.filter(F.col("event_id") % 20 == 0).select(
        "user_id", "ts", (F.col("event_id") % 5).alias("tier")
    )
    left = events.select("event_id", "user_id", "ts")
    return (
        asof_join(left, tiers, key="user_id", ts="ts", value_cols=["tier"])
        .select("event_id", "user_id", "tier")
        .orderBy("event_id")
    )


@_q(
    "range_join_event_windows",
    """
    SELECT w.window_id, e.event_id
    FROM events e
    JOIN (
      SELECT event_id AS window_id, event_type,
             ts AS ws, ts + INTERVAL 2 HOUR AS we
      FROM events WHERE event_id % 100 = 0
    ) w ON e.event_type = w.event_type AND e.ts >= w.ws AND e.ts < w.we
    ORDER BY w.window_id, e.event_id
    """,
)
def range_join_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events falling inside 2-hour observation windows of the same type
    (windows anchored at every 100th event), via the bucketed equi-join."""
    events = load_table(spark, sf_dir, "events")
    windows = events.filter(F.col("event_id") % 100 == 0).select(
        F.col("event_id").alias("window_id"),
        "event_type",
        F.col("ts").alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("we"),
    )
    left = events.select("event_id", "event_type", "ts")
    return (
        interval_range_join(
            left, windows, key="event_type", ts="ts", start="ws", end="we", bucket_seconds=3600
        )
        .select("window_id", "event_id")
        .orderBy("window_id", "event_id")
    )
