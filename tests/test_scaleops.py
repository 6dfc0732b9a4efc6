"""Scale-posture workload tests: result shapes + physical-plan properties."""

from __future__ import annotations

from etl_school_spark.workload import scaleops

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_customer_order_counts_covers_all_customers(spark):
    from etl_school_spark.tables import load_table

    out = scaleops.customer_order_counts(spark, SF)
    n_cust = load_table(spark, SF, "customer").count()
    assert out.count() == n_cust
    assert out.filter("n_orders < 0").count() == 0


def test_anti_join_excludes_matches(spark):
    out = scaleops.customers_without_orders(spark, SF)
    counts = scaleops.customer_order_counts(spark, SF)
    # every returned customer exists in the full customer set
    missing = out.join(counts, "c_custkey", "left_anti")
    assert missing.count() == 0


def test_star_join_broadcasts_dims(spark):
    df = scaleops.revenue_by_nation(spark, SF)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region never shuffle
    assert "BatchEvalPython" not in plan


def test_rollup_has_subtotal_levels(spark):
    rows = scaleops.revenue_rollup(spark, SF).collect()
    grand = [r for r in rows if r.r_name is None and r.n_name is None]
    region_sub = [r for r in rows if r.r_name is not None and r.n_name is None]
    leaves = [r for r in rows if r.n_name is not None]
    assert len(grand) == 1
    assert len(region_sub) >= 1
    total = sum(r.revenue for r in leaves)
    assert abs(total - grand[0].revenue) < 1e-6 * max(1.0, abs(total))


def test_event_gaps_first_event_null_then_monotonic(spark):
    out = scaleops.event_gaps_lag(spark, SF)
    assert out.filter("gap_us < 0").count() == 0  # ordered window → non-negative
    per_user_nulls = out.filter("gap_us IS NULL").groupBy("user_id").count()
    assert per_user_nulls.filter("count != 1").count() == 0  # exactly one first event each


def test_fan_out_skips_probe_past_shuffle_boundary(spark):
    """r10: fan_out's partition probe (df.rdd — full physical planning,
    measured 2.1-7.1 s on deep plans) is skipped when the analyzed plan
    already crosses a shuffle boundary: the frame passes through
    IDENTICALLY (same object). Scans still fan out, an explicit coalesce
    still triggers the repartition (it narrows parallelism — the exact
    condition the guard exists to undo), and a second fan_out of an
    already-fanned frame is an identity."""
    from pyspark.sql import functions as F

    from etl_school_spark.tables import fan_out, load_table

    docs = load_table(spark, SF, "documents")
    fanned = fan_out(docs)
    n = spark.sparkContext.defaultParallelism
    assert fanned.rdd.getNumPartitions() == n  # single-row-group scan widened
    assert fan_out(fanned) is fanned  # Repartition node → no probe, identity

    agg = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    assert fan_out(agg) is agg  # post-aggregate → exchange owns parallelism

    # a JOIN is NOT a guaranteed exchange: a broadcast-hash join keeps
    # the streamed side's (here: single-partition) layout, so joined
    # frames keep the probe and a narrow one still fans out (r10 review)
    joined = docs.join(F.broadcast(docs.select("doc_id").limit(10)), "doc_id")
    assert fan_out(joined).rdd.getNumPartitions() == n

    coalesced = docs.coalesce(1)
    assert fan_out(coalesced) is not coalesced
    assert fan_out(coalesced).rdd.getNumPartitions() == n

    # an explicit NARROWING repartition (repartition(1) — the
    # sorted_single output shape) is a shuffle that narrows parallelism,
    # exactly like coalesce: it must keep the probe and fan back out
    # (r11 review — only the shuffle=false form was carved out before)
    narrowed = docs.repartition(1)
    assert fan_out(narrowed) is not narrowed
    assert fan_out(narrowed).rdd.getNumPartitions() == n
