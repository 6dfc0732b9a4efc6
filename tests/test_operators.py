"""Unit tests for the relational operator layer (SURVEY.md §2)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dsum_exact_and_order_independent(spark):
    from etl_school_spark.operators.aggregates import dsum

    df = spark.createDataFrame([(0.1,), (0.2,), (0.3,)] * 100, "x double")
    total = df.agg(dsum("x").alias("s")).collect()[0].s
    assert total == 60.0  # exact despite binary-float inputs
    total2 = df.repartition(7).agg(dsum("x").alias("s")).collect()[0].s
    assert total2 == 60.0  # partitioning-independent


def test_latest_per_group_deterministic(spark):
    from etl_school_spark.operators.windows import latest_per_group

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 1, 5), ("b", 1, 7)],
        "k string, ts int, id int",
    )
    out = latest_per_group(df, ["k"], [F.desc("ts"), F.desc("id")]).collect()
    got = {(r.k, r.ts, r.id) for r in out}
    assert got == {("a", 2, 20), ("b", 1, 7)}


def test_ratio_to_total_sums_to_100(spark):
    from etl_school_spark.operators.aggregates import ratio_to_total

    df = spark.createDataFrame([("x",)] * 3 + [("y",)] * 1, "k string")
    rows = ratio_to_total(df, ["k"]).collect()
    pct = {r.k: r.pct for r in rows}
    assert pct == {"x": 75.0, "y": 25.0}


def test_json_path_null_safe(spark):
    from etl_school_spark.operators.projections import json_path

    df = spark.createDataFrame(
        [('{"k": 7}',), ('{"other": 1}',), ('{"k": "notanint"}',), (None,)],
        "props string",
    )
    out = df.select(json_path("props", "$.k", "long").alias("k")).collect()
    assert [r.k for r in out] == [7, None, None, None]


def test_three_sigma_outliers(spark):
    from etl_school_spark.operators.joins import three_sigma_outliers

    vals = [(float(i % 10),) for i in range(1000)] + [(1000.0,)]
    df = spark.createDataFrame(vals, "x double")
    out = three_sigma_outliers(df, "x").collect()
    assert [r.x for r in out] == [1000.0]


def test_multi_column_search(spark):
    from etl_school_spark.operators.projections import multi_column_search

    df = spark.createDataFrame(
        [("Alice", "a@x.com"), ("Bob", "ALICE@y.com"), ("Carol", "c@z.com")],
        "name string, email string",
    )
    out = multi_column_search(df, "alice", ["name", "email"]).collect()
    assert {r.name for r in out} == {"Alice", "Bob"}


def test_dim_join_broadcasts(spark):
    from etl_school_spark.operators.joins import dim_join

    fact = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    dim = spark.createDataFrame([(1, "X"), (2, "Y")], "k int, d string")
    out = dim_join(fact, dim, on="k", how="left")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 3


def test_top_k_is_take_ordered(spark):
    from etl_school_spark.operators.sorts import top_k

    df = spark.createDataFrame([(i,) for i in range(100)], "x int")
    out = top_k(df, [F.desc("x")], 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert [r.x for r in out.collect()] == [99, 98, 97]


def test_sharded_sessionization_equals_plain(spark):
    """Boundary-stitched sessionization (the hot-key skew escape hatch
    documented in PLANS.md) must be EXACTLY equivalent to the one-
    partition-per-key formulation — on real event data with awkward
    shard widths, including one forcing many shard crossings."""
    from etl_school_spark.operators.sessions import gap_sessions, gap_sessions_sharded
    from etl_school_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "event_id"
    )
    gap = 30 * 60 * 1_000_000
    plain = {
        (r.user_id, r.ses_start, r.ses_end, r.n_events)
        for r in gap_sessions(ev, "user_id", "ts", gap, "event_id").collect()
    }
    assert len(plain) > 0
    # 7-hour shards (not gap-aligned) and 17-minute shards (SMALLER than
    # the gap → every session spans many shards; stitch chains must merge
    # transitively)
    for shard_us in (7 * 3600 * 1_000_000, 17 * 60 * 1_000_000):
        sharded = {
            (r.user_id, r.ses_start, r.ses_end, r.n_events)
            for r in gap_sessions_sharded(
                ev, "user_id", "ts", gap, "event_id", shard_us=shard_us
            ).collect()
        }
        assert sharded == plain, shard_us


def test_sharded_sessionization_boundary_cases(spark):
    """Hand-built chains across shard boundaries: a session ending
    exactly gap-1us before the next (merge), exactly gap (split — the
    native session_window convention), and a 3-shard-spanning session."""
    import datetime

    from etl_school_spark.operators.sessions import gap_sessions, gap_sessions_sharded

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    us = datetime.timedelta(microseconds=1)
    mins = lambda m: datetime.timedelta(minutes=m)
    rows = [
        # key "a": events every 10 min for 50 min → ONE session spanning
        # three 17-min shards
        *[("a", base + mins(10 * i), i) for i in range(6)],
        # key "b": second event exactly gap after the first → split
        ("b", base, 0),
        ("b", base + mins(30), 1),
        # key "c": second event gap-1us after the first → merge
        ("c", base, 0),
        ("c", base + mins(30) - us, 1),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, eid long")
    gap = 30 * 60 * 1_000_000

    def canon(out):
        return {(r.k, r.ses_start, r.ses_end, r.n_events) for r in out.collect()}

    plain = canon(gap_sessions(df, "k", "ts", gap, "eid"))
    sharded = canon(
        gap_sessions_sharded(df, "k", "ts", gap, "eid", shard_us=17 * 60 * 1_000_000)
    )
    assert sharded == plain
    by_key = {}
    for k, *_ in plain:
        by_key[k] = by_key.get(k, 0) + 1
    assert by_key == {"a": 1, "b": 2, "c": 1}


# ---------------------------------------------------------------------------
# Approximate aggregates (functions/approx.py): error contracts vs exact
# ---------------------------------------------------------------------------
def test_hll_count_within_rsd_and_deterministic(spark):
    from etl_school_spark.functions.approx import hll_count_distinct
    from etl_school_spark.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    exact = orders.select(F.countDistinct("o_custkey")).first()[0]
    approx1 = orders.select(hll_count_distinct("o_custkey", 0.05)).first()[0]
    approx2 = orders.repartition(7).select(hll_count_distinct("o_custkey", 0.05)).first()[0]
    assert abs(approx1 - exact) <= 0.15 * exact  # 3 sigma of rsd=5%
    assert approx1 == approx2  # sketch is deterministic, partition-independent


def test_approx_quantiles_rank_error_bound(spark):
    from etl_school_spark.functions.approx import approx_quantiles
    from etl_school_spark.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    n = orders.count()
    got = orders.select(
        approx_quantiles("o_totalprice", [0.25, 0.5, 0.75], accuracy=1000).alias("q")
    ).first()[0]
    vals = sorted(r[0] for r in orders.select("o_totalprice").collect())
    for p, g in zip([0.25, 0.5, 0.75], got):
        # rank error <= n/accuracy (plus 1 for discrete ranks)
        rank = sum(1 for v in vals if v <= g)
        assert abs(rank - p * n) <= n / 1000 + 1, (p, g, rank)


def test_cardinality_profile_one_pass_shape(spark):
    from etl_school_spark.functions.approx import cardinality_profile
    from etl_school_spark.tables import load_table

    cust = load_table(spark, "/root/testdata/sf0.01", "customer")
    prof = cardinality_profile(cust, ["c_mktsegment", "c_nationkey", "c_custkey"])
    rows = {r.column: r.approx_distinct for r in prof.collect()}
    assert rows["c_mktsegment"] == 5
    assert 20 <= rows["c_nationkey"] <= 30
    exact = cust.count()
    assert abs(rows["c_custkey"] - exact) <= 0.15 * exact
    # one scan: a single Aggregate over the relation, no join/union of scans
    plan = prof._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("relation") == 1
