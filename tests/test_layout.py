"""Physical-layout tests: bucketed joins eliminate the shuffle; salted
joins/aggs match their unsalted equivalents."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_school_spark.operators.layout import (
    colocated_join,
    salted_agg,
    salted_join,
    write_bucketed,
)
from etl_school_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    write_bucketed(orders, "b_orders", ["o_custkey"], 8, sort_cols=["o_custkey"])
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", ["o_custkey"], 8,
        sort_cols=["o_custkey"],
    )
    try:
        # force SMJ so the test proves layout, not broadcast, kills the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and it still computes the right thing
        expected = orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey").groupBy("c_mktsegment").count()
    salted = (
        salted_join(orders, cust, key="o_custkey", unique_col="o_orderkey", n=4)
        .groupBy("c_mktsegment")
        .count()
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_agg_matches_plain_agg(spark):
    li = load_table(spark, SF, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("count_l_orderkey"),
        F.min("l_quantity").alias("min_l_quantity"),
        F.max("l_quantity").alias("max_l_quantity"),
    )
    salted = salted_agg(
        li,
        ["l_returnflag"],
        unique_col="l_orderkey",
        aggs={"l_orderkey": "count", "l_quantity": "min"},
        n=4,
    )
    got = {r.l_returnflag: r.count_l_orderkey for r in salted.collect()}
    want = {r.l_returnflag: r.count_l_orderkey for r in plain.collect()}
    assert got == want
    gmin = {r.l_returnflag: r.min_l_quantity for r in salted.collect()}
    wmin = {r.l_returnflag: r.min_l_quantity for r in plain.collect()}
    assert gmin == wmin


def test_salted_agg_rejects_non_algebraic(spark):
    li = load_table(spark, SF, "lineitem")
    with pytest.raises(ValueError):
        salted_agg(li, ["l_returnflag"], "l_orderkey", {"l_quantity": "avg"})


def test_clustered_write_produces_disjoint_tight_ranges(spark, tmp_path):
    """Range-clustered files carry non-overlapping min/max key stats —
    the property parquet data skipping relies on."""
    import glob

    import pyarrow.parquet as pq

    from etl_school_spark.operators.layout import write_clustered
    from etl_school_spark.tables import load_table

    orders = load_table(spark, SF, "orders")
    path = str(tmp_path / "clustered")
    write_clustered(orders, path, ["o_custkey"], n_files=4)

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["o_custkey"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 3
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # files cover disjoint key ranges

    # and the data survives intact
    assert spark.read.parquet(path).count() == orders.count()


def test_event_user_skew_is_bounded(spark):
    """Evidence for the PLANS.md skew note: the user_id key distribution
    the window queries shuffle on stays near-uniform in the driver's
    testdata (max/mean < 2). If the generator ever plants a hot user,
    this fails and the window queries need the documented
    split-and-stitch treatment instead."""
    from pyspark.sql import functions as F

    from etl_school_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    stats = per_user.agg(
        F.max("n").alias("mx"), F.avg("n").alias("avg")
    ).collect()[0]
    assert stats.mx / stats.avg < 2.0, f"user_id skew factor {stats.mx / stats.avg:.2f}"
