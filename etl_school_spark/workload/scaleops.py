"""Scale-posture workload: join/agg shapes that dominate 100 TB plans.

These go beyond the reference's literal surface (SURVEY.md §2.3 notes no
semi/anti/multi-way joins appear there) but are the plans a production
fact-table deployment of the same engine runs constantly: pre-aggregated
left joins, anti-join existence checks, star-schema chains with broadcast
dims, ROLLUP subtotals, and ordered-window deltas.

Decimal policy follows operators.aggregates: exact decimal sums cast to
double so values are bit-identical to the DuckDB oracle regardless of
partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_school_spark.operators.joins import dim_join
from etl_school_spark.tables import load_table

QUERIES = {}
ORACLES = {}

# suite components: exact-checked at test time (tests/test_entry.py),
# surfaced to the driver inside consolidated suite queries below so the
# whole family fits the driver's 50-query correctness window
COMPONENTS = {}
COMPONENT_ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _c(name: str, oracle: str | None = None):
    def deco(fn):
        COMPONENTS[name] = fn
        if oracle is not None:
            COMPONENT_ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# J4 left-outer with genuinely missing keys + F10 coalesce-default.
# Aggregate-before-join: the orders side shrinks to one row per customer
# BEFORE the join, so the shuffle moves #customers rows, not #orders.
# --------------------------------------------------------------------------
@_c(
    "customer_order_counts",
    """
    SELECT c_custkey, c_mktsegment, coalesce(n, 0) AS n_orders
    FROM customer LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o_custkey
    ORDER BY c_custkey
    """,
)
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select("c_custkey", "c_mktsegment", F.coalesce("n", F.lit(0)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Anti join: customers with no high-value order. The filter is pushed
# below the join, so the probe side shrinks before any shuffle;
# left_anti never materializes the non-matching side's columns.
# --------------------------------------------------------------------------
@_c(
    "customers_without_orders",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    ORDER BY c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


_REVENUE_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))) AS DOUBLE) AS revenue"
)


def _star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer (shuffle, AQE-planned) then nation and
    region via explicit broadcast — the fact side never shuffles for dims."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    j = dim_join(j, nation, on=j.c_nationkey == nation.n_nationkey, how="inner")
    j = dim_join(j, region, on=nation.n_regionkey == region.r_regionkey, how="inner")
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")).cast("decimal(3,2)")
    return j.withColumn("_rev", ep * disc)


@_c(
    "revenue_by_nation",
    f"""
    SELECT r_name, n_name, {_REVENUE_SQL}
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _star(spark, sf_dir)
        .groupBy("r_name", "n_name")
        .agg(F.sum("_rev").cast("double").alias("revenue"))
        .orderBy("r_name", "n_name")
    )


@_c(
    "revenue_rollup",
    f"""
    SELECT r_name, n_name, {_REVENUE_SQL}
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region → nation → grand-total subtotals in one pass (Spark computes
    rollup as a single expand+agg, no per-level rescans)."""
    return (
        _star(spark, sf_dir)
        .rollup("r_name", "n_name")
        .agg(F.sum("_rev").cast("double").alias("revenue"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# Ordered-window delta: microseconds since the previous event per user.
# Unique (ts, event_id) tiebreak keeps lag deterministic across engines.
# --------------------------------------------------------------------------
@_c(
    "event_gaps_lag",
    """
    SELECT user_id, event_id,
           date_diff('microsecond',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS gap_us
    FROM events
    ORDER BY user_id, event_id
    """,
)
def event_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("_prev", F.lag("ts").over(w))
        .select(
            "user_id",
            "event_id",
            F.expr("timestampdiff(MICROSECOND, _prev, ts)").alias("gap_us"),
        )
    )


# --------------------------------------------------------------------------
# Dense time-series resample: hourly counts per event type with missing
# buckets zero-filled. The dense axis is sequence+explode over the global
# hour bounds (a 1-row broadcast, not a scan), crossed with the distinct
# type dimension, then left-joined to the sparse aggregate — the
# sparse→dense shape every training/monitoring pipeline needs before
# windowed models. Axis size is O(hours × types), independent of row
# count, so this stays cheap at any data scale.
# --------------------------------------------------------------------------
@_c(
    "dense_hourly_series",
    """
    WITH b AS (
      SELECT date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx FROM events
    ),
    hours AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket FROM b),
    types AS (SELECT DISTINCT event_type FROM events),
    c AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type, COUNT(*) AS cnt
      FROM events GROUP BY bucket, event_type
    )
    SELECT h.bucket, t.event_type, CAST(coalesce(c.cnt, 0) AS BIGINT) AS n
    FROM hours h CROSS JOIN types t
    LEFT JOIN c ON c.bucket = h.bucket AND c.event_type = t.event_type
    ORDER BY h.bucket, t.event_type
    """,
)
def dense_hourly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(mn, mx, INTERVAL 1 HOUR)")).alias("bucket")
    )
    types = events.select("event_type").distinct()
    sparse = (
        events.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        hours.crossJoin(F.broadcast(types))
        .join(sparse, ["bucket", "event_type"], "left")
        .select("bucket", "event_type", F.coalesce("cnt", F.lit(0)).alias("n"))
        .orderBy("bucket", "event_type")
    )


# --------------------------------------------------------------------------
# PIVOT: long → wide (the inverse of the reference's UNPIVOT, F13).
# Spark's pivot with an explicit value list compiles to one pass of
# conditional aggregates — same plan the portable oracle spells out, no
# second shuffle and no value-discovery job.
# --------------------------------------------------------------------------
@_c(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Exact quantile profiling: Spark's percentile() and DuckDB's
# quantile_cont share the (1-f)·a + f·b interpolation on sorted values,
# so results are bit-identical — verified on both integer and continuous
# columns. (At 100 TB swap in approx_percentile and accept an error
# bound; the exact form is the profiling/oracle baseline.)
# --------------------------------------------------------------------------
@_c(
    "quantile_profile",
    """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.50) AS q50,
           quantile_cont(o_totalprice, 0.90) AS q90,
           quantile_cont(o_totalprice, 0.99) AS q99,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.50)").alias("q50"),
            F.expr("percentile(o_totalprice, 0.90)").alias("q90"),
            F.expr("percentile(o_totalprice, 0.99)").alias("q99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Sessionization: gap-based sessions per user (new session when >30 min
# since the previous event), assigned with lag + a running sum of
# session-start flags — one shuffle on user_id, no iteration. The shape
# every behavioral/training pipeline needs; windows keep it linear at
# any scale.
# --------------------------------------------------------------------------
@_c(
    "event_sessions",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           date_diff('microsecond', min(ts), max(ts)) AS span_us
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn("_prev", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("_prev").isNull()
            | (F.expr("timestampdiff(MICROSECOND, _prev, ts)") > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias("span_us"),
        )
    )


# --------------------------------------------------------------------------
# Feature scaling: per-group z-score normalization. Group stats are a
# tiny aggregate broadcast back over the fact rows (J2 shape); the score
# is rounded to 6 decimals because stddev's float summation differs
# across engines in the last ULPs.
# --------------------------------------------------------------------------
@_c(
    "zscore_order_prices",
    """
    WITH stats AS (
      SELECT o_orderpriority, avg(o_totalprice) AS mu, stddev_samp(o_totalprice) AS sd
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderkey, o.o_orderpriority,
           round((o_totalprice - mu) / sd, 6) AS z
    FROM orders o JOIN stats s ON o.o_orderpriority = s.o_orderpriority
    WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
)
def zscore_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.groupBy("o_orderpriority").agg(
        F.avg("o_totalprice").alias("mu"), F.stddev_samp("o_totalprice").alias("sd")
    )
    return (
        orders.join(F.broadcast(stats), "o_orderpriority")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round((F.col("o_totalprice") - F.col("mu")) / F.col("sd"), 6).alias("z"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Set difference / intersection (completes the §2.7 family beyond the
# reference's UNION ALL): nations that have customers but no suppliers,
# and nations having both. EXCEPT/INTERSECT plan as aggregate+anti/semi
# joins — no full-relation sort.
# --------------------------------------------------------------------------
@_c(
    "nation_set_ops",
    """
    WITH cn AS (SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
                WHERE c_acctbal > 9900),
         sn AS (SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
    SELECT 'supplier_only' AS which, n_name FROM (SELECT n_name FROM sn EXCEPT SELECT n_name FROM cn)
    UNION ALL
    SELECT 'both' AS which, n_name FROM (SELECT n_name FROM sn INTERSECT SELECT n_name FROM cn)
    ORDER BY which, n_name
    """,
)
def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = dim_join(cust, nation, on=cust.c_nationkey == nation.n_nationkey, how="inner").select("n_name").distinct()
    sn = dim_join(supp, nation, on=supp.s_nationkey == nation.n_nationkey, how="inner").select("n_name").distinct()
    only = sn.exceptAll(cn).select(F.lit("supplier_only").alias("which"), "n_name")
    both = sn.intersect(cn).select(F.lit("both").alias("which"), "n_name")
    return only.unionByName(both).orderBy("which", "n_name")


# --------------------------------------------------------------------------
# Running total: cumulative customer spend over order history. The frame
# is rows-unbounded-preceding with a unique (date, key) order, and the
# cumulative sum is an exact decimal cast to double — deterministic at
# any parallelism, like every money aggregate here.
# --------------------------------------------------------------------------
@_c(
    "customer_running_spend",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


# --------------------------------------------------------------------------
# NTILE quartiles: customers bucketed by total spend, then per-quartile
# aggregates — the ranking-family member beyond row_number, identical
# bucket-size semantics across engines given a unique total order.
# --------------------------------------------------------------------------
@_c(
    "customer_spend_quartiles",
    """
    WITH spend AS (
      SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY o_custkey
    ),
    q AS (
      SELECT o_custkey, total,
             ntile(4) OVER (ORDER BY total DESC, o_custkey) AS quartile
      FROM spend
    )
    SELECT CAST(quartile AS BIGINT) AS quartile, COUNT(*) AS n_customers,
           CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS quartile_spend
    FROM q GROUP BY quartile ORDER BY quartile
    """,
)
def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )
    w = Window.orderBy(F.desc("total"), "o_custkey")
    return (
        spend.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("total").cast("decimal(18,2)")).cast("double").alias("quartile_spend"),
        )
        .orderBy("quartile")
    )


# --------------------------------------------------------------------------
# Calendar rollup: orders by ISO weekday and month. Weekday numbering
# conventions differ per engine (Spark dayofweek: 1=Sun; DuckDB
# dayofweek: 0=Sun) — ISO day-of-week is the portable formulation
# (Spark weekday()+1 ≡ DuckDB isodow, both 1=Mon..7=Sun).
# --------------------------------------------------------------------------
@_c(
    "calendar_rollup",
    """
    SELECT isodow(o_orderdate) AS iso_dow,
           CAST(month(o_orderdate) AS BIGINT) AS month,
           COUNT(*) AS n
    FROM orders
    GROUP BY iso_dow, month
    ORDER BY iso_dow, month
    """,
)
def calendar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
            F.month("o_orderdate").cast("long").alias("month"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("iso_dow", "month")
    )


# --------------------------------------------------------------------------
# Correlation profile (rounded — covariance float sums are partition-
# order dependent in the last ULPs) and ordered string aggregation
# (sorted collect → join, deterministic unlike bare listagg).
# --------------------------------------------------------------------------
@_c(
    "correlation_profile",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(corr(l_discount, l_tax), 6) AS corr_disc_tax,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def correlation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.corr("l_discount", "l_tax"), 6).alias("corr_disc_tax"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@_c(
    "statuses_per_priority",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def statuses_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderstatus")), ","
            ).alias("statuses")
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Robust outlier profile: median absolute deviation (MAD) instead of the
# reference's 3-sigma (A4:762-769) — resistant to the outliers it hunts.
# Two exact-percentile passes (group medians broadcast between them);
# exact percentile is bit-identical across engines.
# --------------------------------------------------------------------------
@_c(
    "mad_outlier_profile",
    """
    WITH med AS (
      SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
      FROM orders GROUP BY o_orderpriority
    ),
    dev AS (
      SELECT o.o_orderpriority, m.med, abs(o_totalprice - m.med) AS adev, o_totalprice
      FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority
    ),
    mad AS (
      SELECT o_orderpriority, any_value(med) AS med, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority, m.med, m.mad,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           COUNT(*) AS n
    FROM dev d JOIN mad m ON d.o_orderpriority = m.o_orderpriority
    GROUP BY d.o_orderpriority, m.med, m.mad
    ORDER BY d.o_orderpriority
    """,
)
def mad_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    dev = orders.join(F.broadcast(med), "o_orderpriority").withColumn(
        "adev", F.abs(F.col("o_totalprice") - F.col("med"))
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.first("med").alias("med"), F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority", "med", "mad")
        .agg(
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Fixed-bin histogram: portable floor((x-lo)/w) bucketing (no dialect
# histogram function needed); bins with zero rows are absent by design.
# --------------------------------------------------------------------------
@_c(
    "price_histogram",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           CAST(floor(o_totalprice / 50000) AS BIGINT) * 50000.0 AS bin_lo,
           COUNT(*) AS n
    FROM orders
    GROUP BY bin
    ORDER BY bin
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        orders.groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bin", (F.col("bin") * 50000.0).alias("bin_lo"), "n")
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# OHLC downsampling: per-hour open/high/low/close of the event value.
# Open/close come from row_numbers over a (ts, event_id)-ordered window
# (unique tiebreak ⇒ deterministic, unlike first()/last() on unordered
# groups), then one hash aggregate produces all five measures.
# --------------------------------------------------------------------------
@_c(
    "ohlc_hourly",
    """
    WITH r AS (
      SELECT date_trunc('hour', ts) AS bucket, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts) ORDER BY ts, event_id) AS ra,
             row_number() OVER (PARTITION BY date_trunc('hour', ts) ORDER BY ts DESC, event_id DESC) AS rd
      FROM events
    )
    SELECT bucket,
           MAX(CASE WHEN ra = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rd = 1 THEN value END) AS close,
           COUNT(*) AS n
    FROM r GROUP BY bucket
    ORDER BY bucket
    """,
)
def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    b = F.date_trunc("hour", F.col("ts"))
    wa = Window.partitionBy(b).orderBy("ts", "event_id")
    wd = Window.partitionBy(b).orderBy(F.desc("ts"), F.desc("event_id"))
    r = events.select(
        b.alias("bucket"),
        "value",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return (
        r.groupBy("bucket")
        .agg(
            F.max(F.when(F.col("ra") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rd") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# GROUPING SETS with grouping_id: per-(priority,status), per-priority,
# and grand-total levels in one expand+agg pass — completes the
# multi-level aggregation family next to ROLLUP.
# --------------------------------------------------------------------------
@_c(
    "grouping_sets_orders",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
               COUNT(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# Fuzzy entity matching with ADAPTIVE blocking (r4): candidate pairs come
# from an equi-join on the blocking key (name prefix) for measured-small
# blocks, while oversized blocks are refined by the exact Ed-Join q-gram
# prefix signature (dedup/edjoin.py) — the r3 scale-audit lesson that a
# fixed key degrades as duplicates densify, now implemented instead of
# documented. Same pair set (the refinement is exact), same oracle;
# verify uses equality short-circuit + banded levenshtein(…, 2).
# levenshtein is integer DP, bit-identical across engines.
# --------------------------------------------------------------------------
@_q(
    "fuzzy_name_matches",
    """
    WITH c AS (SELECT c_custkey, c_name, substr(c_name, 1, 17) AS blk FROM customer)
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    ORDER BY id_a, id_b
    """,
)
def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_school_spark.dedup.edjoin import blocked_edit_distance_pairs

    cust = load_table(spark, sf_dir, "customer")
    # deliberately NO global orderBy: the driver compare is
    # order-insensitive, the output is the one registered result that
    # grows quadratically with dup density (7.4 M rows at sf1), and a
    # range sort would re-execute the join+verify child once more just
    # to sample partition boundaries — measured 2× the whole query
    return blocked_edit_distance_pairs(
        cust, "c_custkey", "c_name", prefix_len=17, max_dist=2
    )


# --------------------------------------------------------------------------
# SQL API surface: the same engine drives pure spark.sql text over
# registered views (the reference's native dialect). CTE + window + the
# QUALIFY rewrite (SURVEY §2.5 W3) in one statement — Catalyst plans it
# identically to the DataFrame form.
# --------------------------------------------------------------------------
@_q(
    "sql_surface_latest_big_order",
    """
    WITH big AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      FROM orders WHERE o_totalprice > 200000
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey
      ) AS rn
      FROM big
    )
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM ranked WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def sql_surface_latest_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_school_spark.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH big AS (
          SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
          FROM orders WHERE o_totalprice > 200000
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey
          ) AS rn
          FROM big
        )
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        FROM ranked WHERE rn = 1
        """
        # customer-proportional output → unordered contract (r14): the
        # trailing ORDER BY was determinism-only (the driver compare is
        # order-insensitive; the oracle keeps its ORDER BY) and range-
        # sorts the full result at scale. The W3 QUALIFY-rewrite surface
        # (CTE + window + rn=1 filter) is unchanged.
    )


# ==========================================================================
# Consolidated driver-facing suites (see workload/_suite.py): the scale
# family's components union onto tagged frames, one driver correctness
# row per family, with every value slot explicitly cast on both engines.
# ==========================================================================

from etl_school_spark.workload import relational as _relational  # noqa: E402
from etl_school_spark.workload._suite import (  # noqa: E402
    oracle_branch,
    oracle_union,
    tag_branch,
    union_suite,
    unordered_output,
)

_JOINSHAPE_SCHEMA = {"key": "long", "seg": "string", "n": "long"}

_JOINSHAPE_BRANCHES = {
    "order_counts": (
        "customer_order_counts",
        dict(key="c_custkey", seg="c_mktsegment", n="n_orders"),
    ),
    "without_big_orders": (
        "customers_without_orders",
        dict(key="c_custkey", seg="c_mktsegment"),
    ),
}


@_q(
    "join_shape_suite",
    oracle_union(
        [
            oracle_branch(which, COMPONENT_ORACLES[comp], _JOINSHAPE_SCHEMA, **slots)
            for which, (comp, slots) in _JOINSHAPE_BRANCHES.items()
        ]
    ),
)
def join_shape_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-before-join left outer (shuffle moves one row per
    customer, not per order) + anti-join existence check in one row."""
    branches = [
        tag_branch(COMPONENTS[comp](spark, sf_dir), which, _JOINSHAPE_SCHEMA, **slots)
        for which, (comp, slots) in _JOINSHAPE_BRANCHES.items()
    ]
    # customer-proportional output → unordered contract (r14, guide §2.4)
    return unordered_output(union_suite(branches))


_STAR_SCHEMA = {"r_name": "string", "n_name": "string", "revenue": "double"}

_STAR_BRANCHES = {
    "by_nation": ("revenue_by_nation", dict(r_name="r_name", n_name="n_name", revenue="revenue")),
    "rollup": ("revenue_rollup", dict(r_name="r_name", n_name="n_name", revenue="revenue")),
}


@_q(
    "star_revenue_suite",
    oracle_union(
        [
            oracle_branch(which, COMPONENT_ORACLES[comp], _STAR_SCHEMA, **slots)
            for which, (comp, slots) in _STAR_BRANCHES.items()
        ]
    ),
)
def star_revenue_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 5-table star chain (fact shuffles only for fact-fact joins;
    nation/region broadcast) grouped flat and with ROLLUP subtotals.

    Both branches grow from ONE per-(region, nation) DECIMAL aggregate:
    the rollup's subtotals are re-aggregated from the 25-row flat result
    (decimal addition is exact, so subtotals match a full-relation ROLLUP
    bit-for-bit), and Spark's exchange reuse then evaluates the star join
    once for the whole suite instead of once per branch."""
    flat_dec = (
        _star(spark, sf_dir)
        .groupBy("r_name", "n_name")
        .agg(F.sum("_rev").alias("_rev_dec"))
    )
    by_nation = flat_dec.select(
        "r_name", "n_name", F.col("_rev_dec").cast("double").alias("revenue")
    )
    roll = (
        flat_dec.rollup("r_name", "n_name")
        .agg(F.sum("_rev_dec").cast("double").alias("revenue"))
    )
    slots = dict(r_name="r_name", n_name="n_name", revenue="revenue")
    branches = [
        tag_branch(by_nation, "by_nation", _STAR_SCHEMA, **slots),
        tag_branch(roll, "rollup", _STAR_SCHEMA, **slots),
    ]
    return union_suite(branches).orderBy(
        "which", F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
    )


_EVWIN_SCHEMA = {"user_id": "long", "key": "long", "n": "long", "us": "long"}

_EVWIN_BRANCHES = {
    "gaps_lag": ("event_gaps_lag", dict(user_id="user_id", key="event_id", us="gap_us")),
    "sessions": (
        "event_sessions",
        dict(user_id="user_id", key="session_id", n="n_events", us="span_us"),
    ),
}


@_q(
    "event_window_suite",
    oracle_union(
        [
            oracle_branch(which, COMPONENT_ORACLES[comp], _EVWIN_SCHEMA, **slots)
            for which, (comp, slots) in _EVWIN_BRANCHES.items()
        ]
    ),
)
def event_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-window lag deltas + gap-based sessionization — both one
    shuffle on user_id; integer slots BIGINT-cast on both engines (the
    r1 event_sessions hash mismatch was DuckDB's HUGEINT windowed SUM)."""
    branches = [
        tag_branch(COMPONENTS[comp](spark, sf_dir), which, _EVWIN_SCHEMA, **slots)
        for which, (comp, slots) in _EVWIN_BRANCHES.items()
    ]
    # event-proportional output → unordered contract (r14, guide §2.4:
    # measured 3.26 → 2.83 s median at sf0.1 same-session; at scale the
    # dropped range sort was a full extra pass over the suite's output)
    return unordered_output(union_suite(branches))


_TS_SCHEMA = {
    "bucket": "timestamp_ntz",
    "k": "string",
    "n": "long",
    "x1": "double",
    "x2": "double",
    "x3": "double",
    "x4": "double",
}

_TS_BRANCHES = {
    "dense_hourly": ("dense_hourly_series", dict(bucket="bucket", k="event_type", n="n")),
    "ohlc": (
        "ohlc_hourly",
        dict(bucket="bucket", n="n", x1="open", x2="high", x3="low", x4="close"),
    ),
    "hourly_rollup": (
        "hourly_event_rollup",
        dict(bucket="bucket_hour", k="event_type", n="n", x1="sum_value"),
    ),
}


def _ts_component(name):
    return COMPONENTS[name] if name in COMPONENTS else _relational.COMPONENTS[name]


def _ts_component_oracle(name):
    return (
        COMPONENT_ORACLES[name]
        if name in COMPONENT_ORACLES
        else _relational.COMPONENT_ORACLES[name]
    )


@_q(
    "timeseries_suite",
    oracle_union(
        [
            oracle_branch(which, _ts_component_oracle(comp), _TS_SCHEMA, **slots)
            for which, (comp, slots) in _TS_BRANCHES.items()
        ]
    ),
)
def timeseries_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse→dense hourly resample (zero-filled axis), OHLC
    downsampling, and A11 time-bucketed rollup in one driver row."""
    branches = [
        tag_branch(_ts_component(comp)(spark, sf_dir), which, _TS_SCHEMA, **slots)
        for which, (comp, slots) in _TS_BRANCHES.items()
    ]
    return union_suite(branches).orderBy("which", "bucket", "k")


_ML_SCHEMA = {
    "k1": "string",
    "k2": "string",
    "gid": "long",
    "n1": "long",
    "n2": "long",
    "n3": "long",
    "s": "string",
}

_ML_BRANCHES = {
    "pivot_status": (
        "pivot_status_by_priority",
        dict(k1="o_orderpriority", n1="F", n2="O", n3="P"),
    ),
    "grouping_sets": (
        "grouping_sets_orders",
        dict(k1="o_orderpriority", k2="o_orderstatus", gid="gid", n1="n"),
    ),
    "calendar": (
        "calendar_rollup",
        dict(gid=lambda: F.col("iso_dow") * 100 + F.col("month"), n1="n"),
    ),
    "statuses": ("statuses_per_priority", dict(k1="o_orderpriority", s="statuses")),
}

_ML_ORACLE_SLOTS = {
    "pivot_status": dict(k1="o_orderpriority", n1='"F"', n2='"O"', n3='"P"'),
    "grouping_sets": dict(k1="o_orderpriority", k2="o_orderstatus", gid="gid", n1="n"),
    "calendar": dict(gid="iso_dow * 100 + month", n1="n"),
    "statuses": dict(k1="o_orderpriority", s="statuses"),
}


@_q(
    "multilevel_agg_suite",
    oracle_union(
        [
            oracle_branch(
                which, COMPONENT_ORACLES[comp], _ML_SCHEMA, **_ML_ORACLE_SLOTS[which]
            )
            for which, (comp, _) in _ML_BRANCHES.items()
        ]
    ),
)
def multilevel_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT long→wide, GROUPING SETS with grouping_id, the ISO-portable
    calendar rollup, and ordered string aggregation in one driver row."""
    branches = [
        tag_branch(COMPONENTS[comp](spark, sf_dir), which, _ML_SCHEMA, **slots)
        for which, (comp, slots) in _ML_BRANCHES.items()
    ]
    return union_suite(branches).orderBy("which", "gid", "k1", "k2")


_PROF_SCHEMA = {
    "k1": "string",
    "key": "long",
    "n1": "long",
    "n2": "long",
    "x1": "double",
    "x2": "double",
    "x3": "double",
}

_PROF_BRANCHES = {
    "quantiles": (
        "quantile_profile",
        dict(k1="o_orderpriority", n1="n", x1="q50", x2="q90", x3="q99"),
    ),
    "mad_outliers": (
        "mad_outlier_profile",
        dict(k1="o_orderpriority", n1="n", n2="n_outliers", x1="med", x2="mad"),
    ),
    "correlation": (
        "correlation_profile",
        dict(k1="l_returnflag", n1="n", x1="corr_qty_price", x2="corr_disc_tax"),
    ),
    "zscore": (
        "zscore_order_prices",
        dict(k1="o_orderpriority", key="o_orderkey", x1="z"),
    ),
    "histogram": ("price_histogram", dict(key="bin", n1="n", x1="bin_lo")),
}


@_q(
    "stats_profile_suite",
    oracle_union(
        [
            oracle_branch(which, COMPONENT_ORACLES[comp], _PROF_SCHEMA, **slots)
            for which, (comp, slots) in _PROF_BRANCHES.items()
        ]
    ),
)
def stats_profile_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiling family in one driver row: exact quantiles, MAD robust
    outliers, correlations, per-group z-scores, fixed-bin histogram."""
    branches = [
        tag_branch(COMPONENTS[comp](spark, sf_dir), which, _PROF_SCHEMA, **slots)
        for which, (comp, slots) in _PROF_BRANCHES.items()
    ]
    return union_suite(branches).orderBy("which", "k1", "key")


_WSET_SCHEMA = {
    "k1": "string",
    "key": "long",
    "n": "long",
    "x1": "double",
    "t1": "timestamp_ntz",
}

_WSET_BRANCHES = {
    "running_spend": (
        "customer_running_spend",
        dict(
            k1=lambda: F.col("o_custkey").cast("string"),
            key="o_orderkey",
            x1="running_spend",
            t1="o_orderdate",
        ),
    ),
    "quartiles": (
        "customer_spend_quartiles",
        dict(key="quartile", n="n_customers", x1="quartile_spend"),
    ),
    "set_ops": (
        "nation_set_ops",
        dict(k1=lambda: F.concat_ws(":", "which", "n_name")),
    ),
}

_WSET_ORACLE_SLOTS = {
    "running_spend": dict(
        k1="CAST(o_custkey AS VARCHAR)", key="o_orderkey", x1="running_spend", t1="o_orderdate"
    ),
    "quartiles": dict(key="quartile", n="n_customers", x1="quartile_spend"),
    "set_ops": dict(k1="concat_ws(':', which, n_name)"),
}


@_q(
    "window_setops_suite",
    oracle_union(
        [
            oracle_branch(
                which, COMPONENT_ORACLES[comp], _WSET_SCHEMA, **_WSET_ORACLE_SLOTS[which]
            )
            for which, (comp, _) in _WSET_BRANCHES.items()
        ]
    ),
)
def window_setops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals (rows-unbounded window), NTILE quartiles, and
    EXCEPT/INTERSECT set operations in one driver row."""
    branches = [
        tag_branch(COMPONENTS[comp](spark, sf_dir), which, _WSET_SCHEMA, **slots)
        for which, (comp, slots) in _WSET_BRANCHES.items()
    ]
    return union_suite(branches).orderBy("which", "k1", "key")
