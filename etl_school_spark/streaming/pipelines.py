"""Incremental CDC-style ingest pipelines (SURVEY.md §2.9 T1–T4).

The reference's assignment-4 pipeline is: files land on a stage → COPY
INTO a VARIANT staging table → a typed flattening view → a stream captures
the INSERT delta → a scheduled task appends to the analytic table
(A4:300-345, 380-418). One Structured Streaming query replaces the whole
chain: the file source IS the stream (append-only delta with offsets in
the checkpoint), the typed select IS the view, and the sink append IS the
task. Empty micro-batches are no-ops — ``when system$stream_has_data``
for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_school_spark.schemas import CC_PAYLOAD


def flatten_cc_payload(raw: DataFrame) -> DataFrame:
    """The typed flattening view (A4:253-269): nested payload → 10 typed
    columns + load_ts. NULL-safe: struct access on missing/NULL nests
    yields NULL, matching Snowflake `::` cast semantics."""
    return raw.select(
        F.col("element").cast("long").alias("element"),
        F.col("object").cast("string").alias("object_type"),
        F.col("transaction.id").cast("long").alias("txn_id"),
        F.col("transaction.type").cast("string").alias("txn_type"),
        F.col("transaction.amount").cast("double").alias("amount"),
        F.col("transaction.currency").cast("string").alias("currency"),
        F.to_timestamp_ntz(F.col("transaction.timestamp")).alias("txn_ts"),
        F.col("transaction.approved").cast("boolean").alias("approved"),
        F.col("card.number").cast("string").alias("card_number"),
        F.col("merchant.id").cast("long").alias("merchant_id"),
        F.current_timestamp().cast("timestamp_ntz").alias("load_ts"),
    )


def incremental_ingest(
    spark: SparkSession,
    stage_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema: StructType = CC_PAYLOAD,
    transform=flatten_cc_payload,
    available_now: bool = True,
    processing_time: str = "60 seconds",
    pattern: str | None = None,
):
    """Stage-dir → typed flatten → parquet sink, exactly-once per batch.

    ``available_now=True`` drains the current backlog and terminates
    (deterministic for tests/tasks — the reference's minute-cadence task);
    False runs continuously at ``processing_time`` cadence.
    Returns the StreamingQuery (already awaited when available_now).
    """
    os.makedirs(stage_dir, exist_ok=True)
    reader = spark.readStream.schema(schema)
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    raw = reader.json(stage_dir)
    typed = transform(raw) if transform is not None else raw
    writer = (
        typed.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime=processing_time).start()


class ProgressAudit:
    """T7 for streams: a StreamingQueryListener that appends one JSON-lines
    row per finished micro-batch (query, batch, rows, duration, rates) to
    an audit directory the engine's own queries can analyze — the
    streaming analog of the reference's task_history monitoring
    (A4:692-728)."""

    def __init__(self, spark: SparkSession, audit_dir: str):
        from pyspark.sql.streaming import StreamingQueryListener

        os.makedirs(audit_dir, exist_ok=True)
        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                import json as _json
                import time as _time

                p = event.progress
                row = {
                    "query_id": str(p.id),
                    "name": p.name,
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "input_rows_per_second": p.inputRowsPerSecond,
                    "processed_rows_per_second": p.processedRowsPerSecond,
                    "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
                    "observed_at": _time.time(),
                }
                fname = os.path.join(outer.audit_dir, f"progress_{p.batchId}_{str(p.id)[:8]}.json")
                with open(fname, "a") as fh:
                    fh.write(_json.dumps(row) + "\n")

            def onQueryTerminated(self, event):
                pass

            def onQueryIdle(self, event):
                pass

        self.spark = spark
        self.audit_dir = audit_dir
        self._listener = _L()
        spark.streams.addListener(self._listener)

    def detach(self) -> None:
        self.spark.streams.removeListener(self._listener)

    def history(self) -> DataFrame:
        return self.spark.read.json(self.audit_dir)

    def summary(self) -> DataFrame:
        """Per-query batch counts, rows, and duration stats."""
        h = self.history()
        return h.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("num_input_rows").alias("total_rows"),
            F.avg("batch_duration_ms").alias("avg_batch_ms"),
            F.max("batch_duration_ms").alias("max_batch_ms"),
        )


def incremental_ingest_fanin(
    spark: SparkSession,
    stage_dirs: list[str],
    sink_dir: str,
    checkpoint_dir: str,
    schema: StructType = CC_PAYLOAD,
    transform=flatten_cc_payload,
):
    """T6 fan-in: several stage branches union into ONE sink stream —
    the reference's two generator tasks feeding PIPE3_WAIT_ALL
    (A4:559-602). One checkpoint covers all branches (offsets tracked per
    source), so the merged append is still exactly-once per batch.
    """
    from functools import reduce

    streams = []
    for d in stage_dirs:
        os.makedirs(d, exist_ok=True)
        streams.append(spark.readStream.schema(schema).json(d))
    unioned = reduce(lambda a, b: a.unionByName(b), streams)
    typed = transform(unioned) if transform is not None else unioned
    q = (
        typed.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
