"""Relational workload: SURVEY.md §2.2–2.8 operators on the testdata tables.

Every query aliases computed columns identically in the Spark plan and the
DuckDB oracle (driver hash-compares after sorting columns by name).

Determinism rules applied throughout:
- financial aggregates use exact decimal sums (operators.aggregates.dsum)
- every LIMIT query has a total order (unique tiebreak column)
- no current_timestamp() in checked outputs (wall-clock differs between
  engines at run time); fixed literals instead
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_school_spark.operators.aggregates import dsum, ratio_to_total
from etl_school_spark.operators.joins import dim_join, three_sigma_outliers
from etl_school_spark.operators.projections import json_path, multi_column_search
from etl_school_spark.operators.setops import labelled_counts, values_table
from etl_school_spark.operators.sorts import top_k
from etl_school_spark.operators.windows import latest_per_group
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
# A2/O1 — signature query of the reference: orders per group, count desc
# (commands.sql:112-115, README_teacher.md:439-442)
# --------------------------------------------------------------------------
@_q(
    "orders_per_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY order_count DESC, o_orderpriority
    """,
)
def orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy(F.desc("order_count"), "o_orderpriority")
    )


# --------------------------------------------------------------------------
# A1/A4/A9/A14 — multi-aggregate pricing summary (TPC-H Q1 shape; covers the
# reference's per-segment multi-agg panels, A5:227-237)
# --------------------------------------------------------------------------
@_q(
    "pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(3,2))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # tight decimal precisions keep every product exact (≤38 digits) in both
    # Spark and the DuckDB oracle — no precision-loss rounding divergence
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")).cast("decimal(3,2)")
    tax = (F.lit(1) + F.col("l_tax").cast("decimal(4,2)")).cast("decimal(3,2)")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(ep * disc).cast("double").alias("sum_disc_price"),
            F.sum(ep * disc * tax).cast("double").alias("sum_charge"),
            (dsum("l_quantity") / n).alias("avg_qty"),
            (dsum("l_extendedprice") / n).alias("avg_price"),
            (dsum("l_discount") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# P4/P6 — comparison + timestamp-range predicates (A5:84-100)
# --------------------------------------------------------------------------
@_c(
    "filter_time_range",
    """
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts < TIMESTAMP '2024-01-10 00:00:00' + INTERVAL 5 DAY
      AND value BETWEEN 50 AND 400
    ORDER BY event_id
    """,
)
def filter_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    lo = F.expr("TIMESTAMP_NTZ '2024-01-10 00:00:00'")
    return (
        ev.filter(
            (F.col("ts") >= lo)
            & (F.col("ts") < F.expr("TIMESTAMP_NTZ '2024-01-10 00:00:00' + INTERVAL 5 DAY"))
            & F.col("value").between(50, 400)
        )
        .select("event_id", "ts", "event_type", "value")
    )


# --------------------------------------------------------------------------
# P5 — set-membership filters (A5:73-82 isin per dimension)
# --------------------------------------------------------------------------
@_c(
    "filter_isin_segment",
    """
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AND c_acctbal > 1000
    ORDER BY c_custkey
    """,
)
def filter_isin_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") & (F.col("c_acctbal") > 1000))
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


# --------------------------------------------------------------------------
# P7/F5 — multi-column case-insensitive search (A5:102-111)
# --------------------------------------------------------------------------
@_c(
    "search_ilike",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_name ILIKE '%00001%' OR c_mktsegment ILIKE '%auto%'
    ORDER BY c_custkey
    """,
)
def search_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    found = multi_column_search(cust.select("c_custkey", "c_name", "c_mktsegment"), "00001", ["c_name"]).unionByName(
        multi_column_search(cust.select("c_custkey", "c_name", "c_mktsegment"), "auto", ["c_mktsegment"])
    )
    return found.dropDuplicates(["c_custkey"])


# --------------------------------------------------------------------------
# P9/F1 — regex predicate (A4:758-760 regexp_like validation)
# --------------------------------------------------------------------------
@_c(
    "filter_regex",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE regexp_matches(c_name, '00[0-9]*[02468]$')
    ORDER BY c_custkey
    """,
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_name").rlike("00[0-9]*[02468]$"))
        .select("c_custkey", "c_name")
    )


# --------------------------------------------------------------------------
# P10/P8 — OR'd range/sanity predicate with NULL checks (A4:744-747)
# --------------------------------------------------------------------------
@_c(
    "filter_sanity_or",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_totalprice IS NULL OR o_totalprice < 2000 OR o_totalprice > 450000
       OR o_orderdate > TIMESTAMP '2001-07-01 00:00:00'
    ORDER BY o_orderkey
    """,
)
def filter_sanity_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_totalprice").isNull()
            | (F.col("o_totalprice") < 2000)
            | (F.col("o_totalprice") > 450000)
            | (F.col("o_orderdate") > F.expr("TIMESTAMP_NTZ '2001-07-01 00:00:00'"))
        )
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


# --------------------------------------------------------------------------
# P1/P2 — JSON path extraction with NULL-safe cast (A4:224-269)
# --------------------------------------------------------------------------
@_c(
    "json_extract_typed",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    ORDER BY event_id
    """,
)
def json_extract_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = json_path("props", "$.k", "long")
    return (
        ev.select("event_id", "event_type", k.alias("k_value"))
        .filter(F.col("k_value") >= 50)
    )


# --------------------------------------------------------------------------
# J1/A3 — inner equi-join + multi-column group (A4:916-918, A4:494-497)
# --------------------------------------------------------------------------
@_c(
    "join_orders_customer",
    """
    SELECT c_mktsegment, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderstatus
    ORDER BY c_mktsegment, o_orderstatus
    """,
)
def join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        dim_join(orders, cust, on=orders.o_custkey == cust.c_custkey, how="inner")
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price"))
        .orderBy("c_mktsegment", "o_orderstatus")
    )


# --------------------------------------------------------------------------
# J4 — broadcast left join to small dimension (data_generator.py:34-37)
# --------------------------------------------------------------------------
@_c(
    "join_lineitem_part",
    """
    SELECT p_brand,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def join_lineitem_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        dim_join(li, part, on=li.l_partkey == part.p_partkey, how="left")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity").alias("sum_qty"))
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# J2/A5 — 3-sigma outlier detection via scalar stats (A4:762-769)
# --------------------------------------------------------------------------
@_c(
    "outliers_3sigma",
    """
    WITH stats AS (SELECT AVG(o_totalprice) AS mu, STDDEV_SAMP(o_totalprice) AS sigma FROM orders)
    SELECT o_orderkey, o_totalprice
    FROM orders, stats
    WHERE o_totalprice > mu + 3 * sigma OR o_totalprice < mu - 3 * sigma
    ORDER BY o_orderkey
    """,
)
def outliers_3sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        three_sigma_outliers(orders, "o_totalprice")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# W1/J3 — ratio-to-total over empty window (A4:489-492)
# --------------------------------------------------------------------------
@_c(
    "ratio_to_total_segment",
    """
    SELECT c_mktsegment, COUNT(*) AS n,
           ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (), 2) AS pct
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def ratio_to_total_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return ratio_to_total(cust, ["c_mktsegment"]).orderBy("c_mktsegment")


# --------------------------------------------------------------------------
# W2/W3 — latest-per-group, QUALIFY rewrite (A4:824-833, A4:902-907)
# --------------------------------------------------------------------------
@_c(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, ts, event_type
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        latest_per_group(ev, ["user_id"], [F.desc("ts"), F.desc("event_id")])
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# A6/A7/A14 — conditional aggregation + distinct counts + null-safe division
# (A4:800-818, A5:135)
# --------------------------------------------------------------------------
@_c(
    "conditional_agg_profile",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CASE WHEN value > 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           ROUND(CAST(SUM(CASE WHEN value > 250 THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(COUNT(*), 0), 4) AS high_share
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def conditional_agg_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n_high = F.sum(F.when(F.col("value") > 250, 1).otherwise(0))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            n_high.alias("n_high"),
            F.round(n_high.cast("double") / F.nullif(F.count(F.lit(1)), F.lit(0)), 4).alias("high_share"),
        )
    )


# --------------------------------------------------------------------------
# A8 — GROUP BY … HAVING duplicate detection (A4:738-742)
# --------------------------------------------------------------------------
@_c(
    "having_wide_orders",
    """
    SELECT l_orderkey, COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) >= 6
    ORDER BY l_orderkey
    """,
)
def having_wide_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .filter(F.col("n_lines") >= 6)
    )


# --------------------------------------------------------------------------
# A13 — DISTINCT dedup (commands.sql:126-128, A5:51-57)
# --------------------------------------------------------------------------
@_c(
    "distinct_flag_status",
    """
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


# --------------------------------------------------------------------------
# U1 — N-way UNION ALL of labelled counts (A4:480-486)
# --------------------------------------------------------------------------
@_c(
    "union_stage_counts",
    """
    SELECT 'region' AS stage, COUNT(*) AS n_rows FROM region
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    ORDER BY stage
    """,
)
def union_stage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = {
        n: load_table(spark, sf_dir, n) for n in ["region", "nation", "customer", "supplier"]
    }
    return labelled_counts(parts)


# --------------------------------------------------------------------------
# U3/J1/G7 — VALUES thresholds joined to computed metrics → alerts
# (A4:874-919)
# --------------------------------------------------------------------------
@_c(
    "threshold_alerts",
    """
    WITH metrics AS (
      SELECT event_type AS metric_name,
             ROUND(CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS metric_value
      FROM events GROUP BY event_type
    ),
    thresholds AS (
      SELECT * FROM (VALUES ('click', 0.50), ('view', 0.50), ('purchase', 0.60), ('error', 0.70), ('signup', 0.80))
        AS t(metric_name, threshold)
    )
    SELECT m.metric_name, m.metric_value, CAST(t.threshold AS DOUBLE) AS threshold
    FROM metrics m JOIN thresholds t ON m.metric_name = t.metric_name
    WHERE m.metric_value < t.threshold
    ORDER BY m.metric_name
    """,
)
def threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    metrics = ev.groupBy(F.col("event_type").alias("metric_name")).agg(
        F.round(
            F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).cast("double") / F.count(F.lit(1)),
            4,
        ).alias("metric_value")
    )
    thresholds = values_table(
        spark,
        [("click", 0.50), ("view", 0.50), ("purchase", 0.60), ("error", 0.70), ("signup", 0.80)],
        "metric_name string, threshold double",
    )
    return (
        metrics.join(F.broadcast(thresholds), "metric_name", "inner")
        .filter(F.col("metric_value") < F.col("threshold"))
        .select("metric_name", "metric_value", "threshold")
        .orderBy("metric_name")
    )


# --------------------------------------------------------------------------
# O1 — distributed top-K (A5:154-163 top-N panels)
# --------------------------------------------------------------------------
@_q(
    "topk_customers_by_spend",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spend DESC, c_custkey
    LIMIT 10
    """,
)
def topk_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    agged = (
        dim_join(orders, cust, on=orders.o_custkey == cust.c_custkey, how="inner")
        .groupBy("c_custkey", "c_name")
        .agg(dsum("o_totalprice").alias("total_spend"))
    )
    return top_k(agged, [F.desc("total_spend"), "c_custkey"], 10)


# --------------------------------------------------------------------------
# A11/F8 — time-bucketed aggregation (A4:924-930 date_trunc trend view)
# --------------------------------------------------------------------------
@_c(
    "hourly_event_rollup",
    """
    SELECT date_trunc('hour', ts) AS bucket_hour, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
    GROUP BY bucket_hour, event_type
    ORDER BY bucket_hour, event_type
    """,
)
def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") < F.expr("TIMESTAMP_NTZ '2024-01-03 00:00:00'"))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket_hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .orderBy("bucket_hour", "event_type")
    )


# --------------------------------------------------------------------------
# A12/F7 — min/max timestamps + second-granularity span (A4:692-728)
# --------------------------------------------------------------------------
@_c(
    "event_span_per_user",
    """
    SELECT user_id,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT) AS span_sec
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def event_span_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.expr("timestampdiff(SECOND, min(ts), max(ts))").cast("long").alias("span_sec"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# F1/F2/F3/F4 — masking expressions: regex PAN mask, slice+concat mask, sha2
# (A4:945-949, A4:983-989, A4:1022, A4:1060)
# --------------------------------------------------------------------------
@_c(
    "masking_functions",
    """
    WITH pans AS (
      SELECT c_custkey,
             lpad(CAST(c_custkey * 7919 + 1000000007 AS VARCHAR), 16, '0') AS pan
      FROM customer
    )
    SELECT c_custkey,
           regexp_replace(pan, '^([0-9]{0,15})([0-9]{4})$', '***************\\2') AS pan_masked,
           substr(pan, 1, 4) || '********' || substr(pan, 13, 4) AS pan_slice_mask,
           sha256(pan) AS pan_sha
    FROM pans
    ORDER BY c_custkey
    """,
)
def masking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pan = F.lpad((F.col("c_custkey") * 7919 + 1000000007).cast("string"), 16, "0")
    return (
        cust.select(
            "c_custkey",
            F.regexp_replace(pan, r"^([0-9]{0,15})([0-9]{4})$", r"***************$2").alias("pan_masked"),
            F.concat(F.substring(pan, 1, 4), F.lit("********"), F.substring(pan, 13, 4)).alias("pan_slice_mask"),
            F.sha2(pan, 256).alias("pan_sha"),
        )
    )


# --------------------------------------------------------------------------
# F13 — UNPIVOT wide metrics to long form (A4:807, 821-823)
# --------------------------------------------------------------------------
@_c(
    "unpivot_metrics",
    """
    WITH wide AS (
      SELECT
        CAST(COUNT(*) AS DOUBLE) AS n_rows,
        CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem
    )
    SELECT metric_name, metric_value
    FROM wide UNPIVOT (metric_value FOR metric_name IN (n_rows, n_orders, total_qty))
    ORDER BY metric_name
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.agg(
        F.count(F.lit(1)).cast("double").alias("n_rows"),
        F.countDistinct("l_orderkey").cast("double").alias("n_orders"),
        dsum("l_quantity").alias("total_qty"),
    )
    return wide.unpivot([], ["n_rows", "n_orders", "total_qty"], "metric_name", "metric_value")


# --------------------------------------------------------------------------
# F7/F8/F11 — date arithmetic, truncation, rounding, abs/mod generalization
# (A4:396-397, A4:927, A4:1061)
# --------------------------------------------------------------------------
@_c(
    "scalar_function_suite",
    """
    SELECT event_id,
           ts + INTERVAL 24 HOUR AS ts_next_day,
           date_trunc('day', ts) AS ts_day,
           ROUND(value * 100, 2) AS value_cents,
           abs(user_id) % 100 AS user_bucket
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
)
def scalar_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_id") < 500)
        .select(
            "event_id",
            F.expr("ts + INTERVAL 24 HOURS").alias("ts_next_day"),
            F.date_trunc("day", F.col("ts")).alias("ts_day"),
            F.round(F.col("value") * 100, 2).alias("value_cents"),
            (F.abs(F.col("user_id")) % 100).alias("user_bucket"),
        )
    )


# ==========================================================================
# Consolidated driver-facing suites (see workload/_suite.py). Each suite
# unions its components' full results onto one tagged frame — one driver
# correctness row per FAMILY, zero loss of value-level checking. Catalyst
# plans each branch independently under the Union, so per-component plan
# properties (pushdown, broadcasts) are preserved and still gated by
# tests/test_plans.py.
# ==========================================================================

from etl_school_spark.workload._suite import (  # noqa: E402
    oracle_branch,
    oracle_union,
    tag_branch,
    union_suite,
    unordered_output,
)

_FILTER_SCHEMA = {
    "key": "long",
    "s1": "string",
    "s2": "string",
    "x": "double",
    "t": "timestamp_ntz",
}

_FILTER_BRANCHES = {
    # which → (component, spark slots, oracle slot exprs)
    "time_range": (
        "filter_time_range",
        dict(key="event_id", s1="event_type", x="value", t="ts"),
    ),
    "isin_segment": (
        "filter_isin_segment",
        dict(key="c_custkey", s1="c_name", s2="c_mktsegment", x="c_acctbal"),
    ),
    "ilike": (
        "search_ilike",
        dict(key="c_custkey", s1="c_name", s2="c_mktsegment"),
    ),
    "regex": ("filter_regex", dict(key="c_custkey", s1="c_name")),
    "sanity_or": (
        "filter_sanity_or",
        dict(key="o_orderkey", x="o_totalprice", t="o_orderdate"),
    ),
    "json_typed": (
        "json_extract_typed",
        dict(key="event_id", s1="event_type", x="k_value"),
    ),
}


@_q(
    "filter_predicate_suite",
    oracle_union(
        [
            oracle_branch(which, COMPONENT_ORACLES[comp], _FILTER_SCHEMA, **slots)
            for which, (comp, slots) in _FILTER_BRANCHES.items()
        ]
    ),
)
def filter_predicate_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4–P10 + P1/P3 in one driver row: every predicate family's full
    row-level result, tagged and unioned."""
    branches = [
        tag_branch(COMPONENTS[comp](spark, sf_dir), which, _FILTER_SCHEMA, **slots)
        for which, (comp, slots) in _FILTER_BRANCHES.items()
    ]
    # event-proportional output → unordered contract (r14, guide §2.4:
    # the orderBy tail was determinism-only; its range exchange re-ran
    # the union for bound sampling and would range-sort the full result
    # at scale — the driver compare is order-insensitive)
    return unordered_output(union_suite(branches))


_JOIN_SCHEMA = {"k1": "string", "k2": "string", "n": "long", "val": "double"}

_JOIN_BRANCHES = {
    "orders_customer": (
        "join_orders_customer",
        dict(k1="c_mktsegment", k2="o_orderstatus", n="n_orders", val="total_price"),
    ),
    "lineitem_part": (
        "join_lineitem_part",
        dict(k1="p_brand", n="n_lines", val="sum_qty"),
    ),
}


@_q(
    "join_agg_suite",
    oracle_union(
        [
            oracle_branch(which, COMPONENT_ORACLES[comp], _JOIN_SCHEMA, **slots)
            for which, (comp, slots) in _JOIN_BRANCHES.items()
        ]
    ),
)
def join_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (inner equi-join + multi-col group) and J4 (broadcast dim left
    join) — both broadcast plans asserted in tests/test_plans.py."""
    branches = [
        tag_branch(COMPONENTS[comp](spark, sf_dir), which, _JOIN_SCHEMA, **slots)
        for which, (comp, slots) in _JOIN_BRANCHES.items()
    ]
    return union_suite(branches).orderBy("which", "k1", "k2")


_STATS_SCHEMA = {
    "k1": "string",
    "key": "long",
    "n": "long",
    "x1": "double",
    "x2": "double",
}

_STATS_BRANCHES = {
    "outliers_3sigma": (
        "outliers_3sigma",
        dict(key="o_orderkey", x1="o_totalprice"),
    ),
    "ratio_to_total": (
        "ratio_to_total_segment",
        dict(k1="c_mktsegment", n="n", x1="pct"),
    ),
    "threshold_alerts": (
        "threshold_alerts",
        dict(k1="metric_name", x1="metric_value", x2="threshold"),
    ),
}


@_q(
    "stats_alert_suite",
    oracle_union(
        [
            oracle_branch(which, COMPONENT_ORACLES[comp], _STATS_SCHEMA, **slots)
            for which, (comp, slots) in _STATS_BRANCHES.items()
        ]
    ),
)
def stats_alert_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 scalar-stats cross join (3-sigma), W1/J3 ratio-to-total, and
    U3/G7 VALUES-thresholds alerting in one driver row."""
    branches = [
        tag_branch(COMPONENTS[comp](spark, sf_dir), which, _STATS_SCHEMA, **slots)
        for which, (comp, slots) in _STATS_BRANCHES.items()
    ]
    return union_suite(branches).orderBy("which", "k1", "key")


_GROUP_SCHEMA = {
    "k1": "string",
    "key": "long",
    "n1": "long",
    "n2": "long",
    "n3": "long",
    "x1": "double",
}

_GROUP_BRANCHES = {
    "conditional_profile": (
        "conditional_agg_profile",
        dict(k1="event_type", n1="n_events", n2="n_users", n3="n_high", x1="high_share"),
    ),
    "having_wide": ("having_wide_orders", dict(key="l_orderkey", n1="n_lines")),
    "distinct_flag": (
        "distinct_flag_status",
        dict(k1=lambda: F.concat_ws("/", "l_returnflag", "l_linestatus")),
    ),
    "union_counts": ("union_stage_counts", dict(k1="stage", n1="n_rows")),
}

_GROUP_ORACLE_SLOTS = {
    "conditional_profile": dict(
        k1="event_type", n1="n_events", n2="n_users", n3="n_high", x1="high_share"
    ),
    "having_wide": dict(key="l_orderkey", n1="n_lines"),
    "distinct_flag": dict(k1="concat_ws('/', l_returnflag, l_linestatus)"),
    "union_counts": dict(k1="stage", n1="n_rows"),
}


@_q(
    "group_agg_suite",
    oracle_union(
        [
            oracle_branch(
                which, COMPONENT_ORACLES[comp], _GROUP_SCHEMA, **_GROUP_ORACLE_SLOTS[which]
            )
            for which, (comp, _) in _GROUP_BRANCHES.items()
        ]
    ),
)
def group_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7/A14 conditional aggregation, A8 HAVING, A13 DISTINCT, and
    U1 labelled UNION ALL counts in one driver row."""
    branches = [
        tag_branch(COMPONENTS[comp](spark, sf_dir), which, _GROUP_SCHEMA, **slots)
        for which, (comp, slots) in _GROUP_BRANCHES.items()
    ]
    # user/key-proportional output → unordered contract (r14, guide §2.4)
    return unordered_output(union_suite(branches))


@_q(
    "per_user_event_profile",
    f"""
    SELECT l.user_id, l.event_id, l.ts, l.event_type,
           s.first_ts, s.last_ts, s.span_sec
    FROM ({COMPONENT_ORACLES["latest_event_per_user"]}) l
    JOIN ({COMPONENT_ORACLES["event_span_per_user"]}) s ON l.user_id = s.user_id
    ORDER BY l.user_id
    """,
)
def per_user_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/W3 latest-per-group joined to A12 min/max+span — the per-entity
    profile shape, one row per user, window + aggregate in one plan."""
    latest = COMPONENTS["latest_event_per_user"](spark, sf_dir)
    span = COMPONENTS["event_span_per_user"](spark, sf_dir)
    # one row per user → user-proportional → unordered contract (r14)
    return unordered_output(latest.join(span, "user_id"))


_SCALAR_SCHEMA = {
    "key": "long",
    "s1": "string",
    "s2": "string",
    "s3": "string",
    "x1": "double",
    "x2": "double",
    "t1": "timestamp_ntz",
    "t2": "timestamp_ntz",
}

_SCALAR_BRANCHES = {
    "masking": (
        "masking_functions",
        dict(key="c_custkey", s1="pan_masked", s2="pan_slice_mask", s3="pan_sha"),
    ),
    "scalar_funcs": (
        "scalar_function_suite",
        dict(key="event_id", x1="value_cents", x2="user_bucket", t1="ts_next_day", t2="ts_day"),
    ),
    "unpivot": ("unpivot_metrics", dict(s1="metric_name", x1="metric_value")),
}


@_q(
    "scalar_mask_suite",
    oracle_union(
        [
            oracle_branch(which, COMPONENT_ORACLES[comp], _SCALAR_SCHEMA, **slots)
            for which, (comp, slots) in _SCALAR_BRANCHES.items()
        ]
    ),
)
def scalar_mask_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1–F14 scalar families in one driver row: masking expressions
    (regex/slice/sha2), date arithmetic + rounding, and UNPIVOT."""
    branches = [
        tag_branch(COMPONENTS[comp](spark, sf_dir), which, _SCALAR_SCHEMA, **slots)
        for which, (comp, slots) in _SCALAR_BRANCHES.items()
    ]
    # row-proportional output → unordered contract (r14, guide §2.4)
    return unordered_output(union_suite(branches))
