"""Catalog access for the driver's TPC-H-ish parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings. One parquet file per table under an sf dir.

`events.ts` is stored as parquet TIMESTAMP(NANOS, isAdjustedToUTC=false),
which Spark's reader rejects; we read it as long (legacy.parquet.nanosAsLong)
and rebuild a TIMESTAMP_NTZ from epoch micros. The reconstruction is done in
NTZ space (timestampadd on an NTZ literal) so it is independent of the
session time zone and matches DuckDB's micro-precision view of the column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_school_spark.session import ensure_engine_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions that should always be broadcast when joined against a
# fact table. At 100 TB these stay O(KB-MB) while facts scale, so a
# broadcast-hash join (no shuffle of the fact side) is the right plan.
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    return df


#: logical nodes whose presence GUARANTEES the plan crosses an exchange
#: (or an explicit repartition) — downstream of one, the frame's
#: parallelism is the exchange's concern, not the scan's, so fan_out's
#: narrow-scan guard does not apply. Union is deliberately absent (it is
#: not a shuffle); coalesce (Repartition with shuffle=false) is handled
#: separately because it NARROWS parallelism. Join is ALSO deliberately
#: absent (r10 review): a broadcast-hash join leaves the streamed
#: side's partitioning untouched, so a 1-partition scan joined to a
#: tiny dim is still the serialized-fold case the guard exists to undo
#: — joined frames keep the partition probe (its physical-planning
#: cost is memoized per DataFrame object, and the library's hot
#: fan_out sites wrap scans or already-fanned frames anyway).
_SHUFFLE_NODES = {
    "Repartition",
    "RepartitionByExpression",
    "Aggregate",
    "Window",
    "Deduplicate",
}


def _has_shuffle_boundary(jplan, parallelism: int) -> bool:
    """Walk the ANALYZED logical plan (py4j node traversal — a few
    hundred μs even on wide plans, since it visits nodes, not the
    literal-heavy expression trees) looking for any _SHUFFLE_NODES
    member. A coalesce (Repartition(shuffle=false)) does not count —
    it narrows parallelism, exactly what the guard exists to undo —
    and neither does an explicit NARROWING repartition(k < parallelism)
    (r11: repartition(1), the sorted_single output shape, is a shuffle
    that narrows exactly like coalesce; both keep the probe)."""
    name = jplan.nodeName()
    if name in _SHUFFLE_NODES and not (
        name == "Repartition"
        and (not jplan.shuffle() or jplan.numPartitions() < parallelism)
    ):
        return True
    ch = jplan.children()
    for i in range(ch.size()):
        if _has_shuffle_boundary(ch.apply(i), parallelism):
            return True
    return False


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Restore parallelism after a scan of few-row-group files, for
    pipelines whose PRE-shuffle work is expensive (hyperplane codes,
    shingling, md5 signatures, bucket-join expansion).

    Spark parallelizes scans by splitting files at row-group boundaries;
    the test tables are single-row-group parquet, so every scan yields ONE
    partition and everything before the first shuffle runs on one core
    (measured: the near-dup bucket join spent 10 s expanding 12 M rows on
    one thread at sf0.1). At 100 TB scans split naturally into thousands
    of partitions and this helper returns the frame UNCHANGED — the
    round-robin shuffle is applied only when the scan is narrower than the
    cluster's parallelism, where it is a skinny one-time cost. Row order
    is not semantically meaningful to any caller (all registered queries
    end in an explicit sort), and round-robin repartition is
    retry-deterministic (Spark sorts within partitions before dealing).

    Probe cost (r10, measured): ``df.rdd.getNumPartitions()`` runs full
    physical planning — free on a scan (~0.2 s once, memoized per
    DataFrame object) but 2.1–7.1 s on deep multi-join plans. Plans
    that already contain a GUARANTEED shuffle boundary (aggregate/
    window/deduplicate/explicit repartition — _has_shuffle_boundary, an
    analyzed-plan node walk costing well under a millisecond) skip the
    probe entirely and pass through: downstream of an exchange the
    frame's parallelism is the exchange's (≥
    spark.sql.shuffle.partitions at scale; a small-data AQE coalesce
    below that is exactly the case where a forced repartition buys
    nothing). Joins do NOT skip (a broadcast-hash join preserves the
    streamed side's partitioning), and neither does coalesce — it
    narrows parallelism, which is what this guard exists to undo."""
    if df.isStreaming:
        # streaming frames have no static partition count to inspect and
        # micro-batch parallelism is the trigger's concern — pass through
        # so batch/stream-shared operators can apply the guard blindly
        return df
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    if _has_shuffle_boundary(df._jdf.queryExecution().analyzed(), n):
        return df
    # Probe memo (r15, VERDICT item 2 — serial construction overhead):
    # the physical-planning probe costs ~50 ms per call and the SAME
    # scan-shaped frames are re-probed on every query construction (the
    # bench's warm lane re-constructs each query per iteration: ~0.8 s
    # of probes per sweep). A frame's partition count is a pure function
    # of its canonicalized plan + session confs, so memoize per
    # (application, semantic hash, parallelism). The memo holds partition
    # COUNTS only — never data — and a hash collision can only mis-size
    # a round-robin repartition, never change results.
    try:
        key = (df.sparkSession.sparkContext.applicationId, df.semanticHash(), n)
    except Exception:
        key = None
    if key is not None and key in _FANOUT_PROBE_MEMO:
        k = _FANOUT_PROBE_MEMO[key]
    else:
        k = df.rdd.getNumPartitions()
        if key is not None:
            if len(_FANOUT_PROBE_MEMO) > 512:
                _FANOUT_PROBE_MEMO.clear()
            _FANOUT_PROBE_MEMO[key] = k
    if k >= n:
        return df
    return df.repartition(n)


_FANOUT_PROBE_MEMO: dict[tuple, int] = {}


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view for spark.sql use."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
