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
from etl_school_spark.workload._suite import unordered_output

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
        .transform(unordered_output)
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
        .transform(unordered_output)
    )


# --------------------------------------------------------------------------
# Native Spark session windows (F.session_window): gap-based sessions as
# a first-class GROUP BY operator — the same semantics the manual
# lag+running-sum formulation (event_window_suite:sessions) builds by
# hand, but engine-native, and the construct Structured Streaming uses
# for streaming sessionization. Spark closes a session when the next
# event arrives AT or after last_ts + gap, so the oracle's gaps-and-
# islands flag uses >= (the manual query's convention is >, a different
# boundary rule — both are checked).
# window.start = min(ts); window.end = max(ts) + gap. Emitted as NTZ-
# epoch micros (tz-independent on both engines).
# --------------------------------------------------------------------------
@_q(
    "session_window_rollup",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
                  THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, value,
             CAST(SUM(ns) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS sid
      FROM flagged
    )
    SELECT user_id,
           epoch_us(min(ts)) AS ses_start_us,
           epoch_us(max(ts)) + 1800000000 AS ses_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM s
    GROUP BY user_id, sid
    ORDER BY user_id, ses_start_us
    """,
)
def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_school_spark.operators.aggregates import dsum

    events = load_table(spark, sf_dir, "events")
    # session_window needs an absolute TIMESTAMP; NTZ-epoch micros keep it
    # session-timezone-independent (same trick as the streaming queries)
    abs_ts = F.timestamp_micros(
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    )
    return (
        events.select("user_id", abs_ts.alias("ts_abs"), "value")
        .groupBy("user_id", F.session_window("ts_abs", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("ses_start_us"),
            F.unix_micros("w.end").alias("ses_end_us"),
            "n_events",
            "sum_value",
        )
        .transform(unordered_output)
    )
