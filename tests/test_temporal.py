"""Temporal-join edge semantics: at-or-before inclusion, no-prior NULLs,
inner mode, and bucketed-range-join equivalence to the naive plan."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_school_spark.operators.temporal import asof_join, interval_range_join


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_asof_edges(spark):
    left = spark.createDataFrame(
        [(1, _ts(9)), (2, _ts(10)), (3, _ts(11)), (4, _ts(8))],
        "id long, ts timestamp_ntz",
    ).withColumn("k", F.lit("a"))
    right = spark.createDataFrame(
        [(_ts(10), 100), (_ts(9), 90)], "ts timestamp_ntz, v long"
    ).withColumn("k", F.lit("a"))

    got = {r.id: r.v for r in asof_join(left, right, "k", "ts", ["v"]).collect()}
    assert got[1] == 90  # equal ts → right row visible (at-or-before)
    assert got[2] == 100
    assert got[3] == 100  # carries forward
    assert got[4] is None  # no prior right row → NULL in left mode

    inner = asof_join(left, right, "k", "ts", ["v"], how="inner")
    assert {r.id for r in inner.collect()} == {1, 2, 3}


def test_asof_keys_do_not_leak(spark):
    left = spark.createDataFrame([("a", 1, _ts(12)), ("b", 2, _ts(12))], "k string, id long, ts timestamp_ntz")
    right = spark.createDataFrame([("a", _ts(11), 7)], "k string, ts timestamp_ntz, v long")
    got = {r.id: r.v for r in asof_join(left, right, "k", "ts", ["v"]).collect()}
    assert got == {1: 7, 2: None}  # b never sees a's values


def test_range_join_matches_naive(spark):
    from etl_school_spark.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    windows = events.filter(F.col("event_id") % 50 == 0).select(
        F.col("event_id").alias("window_id"),
        "event_type",
        F.col("ts").alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 151 MINUTES")).alias("we"),  # not bucket-aligned
    )
    left = events.select("event_id", "event_type", "ts")
    fast = interval_range_join(left, windows, "event_type", "ts", "ws", "we", bucket_seconds=3600)
    naive = left.join(windows, "event_type").filter(
        (F.col("ts") >= F.col("ws")) & (F.col("ts") < F.col("we"))
    )
    f = {(r.window_id, r.event_id) for r in fast.collect()}
    n = {(r.window_id, r.event_id) for r in naive.collect()}
    assert f == n and len(f) > 0


def test_asof_latest_null_value_is_carried_not_skipped(spark):
    """A right row whose value is legitimately NULL must win over an older
    non-NULL row (struct-carry semantics), and inner mode must keep the
    matched row (ADVICE r1: last(ignorenulls) on the bare column skipped
    NULL-valued right rows)."""
    left = spark.createDataFrame([(1, _ts(12))], "id long, ts timestamp_ntz").withColumn(
        "k", F.lit("a")
    )
    right = spark.createDataFrame(
        [(_ts(9), 90), (_ts(11), None)], "ts timestamp_ntz, v long"
    ).withColumn("k", F.lit("a"))

    out = asof_join(left, right, "k", "ts", ["v"]).collect()
    assert len(out) == 1 and out[0].v is None  # latest row's NULL, not 90

    inner = asof_join(left, right, "k", "ts", ["v"], how="inner").collect()
    assert len(inner) == 1 and inner[0].v is None  # matched → kept
