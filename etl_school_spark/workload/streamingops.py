"""Streaming workload entries — real Structured Streaming runs that
terminate deterministically (trigger availableNow) so the driver can
compare their sink contents against a batch oracle.

The pipeline under test is the reference's stage→flatten→append CDC chain
(SURVEY.md §2.9 T1/T2) applied to the events table: events rows are
staged as JSON-lines files, a checkpointed file-source stream types them
and appends to a parquet sink, and the query returns the sink — which must
equal the equivalent batch SELECT (the oracle).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_school_spark.schemas import EVENTS
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


_N_STREAM_EVENTS = 300


def _stage_events_json(spark: SparkSession, sf_dir: str, stage_dir: str) -> None:
    """Write the first N events as JSON-lines files onto the stage (3 files
    — multiple micro-batch source files)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < _N_STREAM_EVENTS)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .orderBy("event_id")
        .collect()
    )
    os.makedirs(stage_dir, exist_ok=True)
    per_file = (len(ev) + 2) // 3
    for fi in range(3):
        chunk = ev[fi * per_file : (fi + 1) * per_file]
        with open(os.path.join(stage_dir, f"events_{fi}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r.asDict()) + "\n")


@_q(
    "streaming_incremental_ingest",
    f"""
    SELECT event_id, ts, user_id, event_type, value,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE event_id < {_N_STREAM_EVENTS}
    ORDER BY event_id
    """,
)
def streaming_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage → checkpointed stream → typed flatten → parquet sink, drained
    with availableNow; returns the sink contents."""
    work = tempfile.mkdtemp(prefix="etl_stream_")
    stage, sink, ckpt = (os.path.join(work, d) for d in ("stage", "sink", "ckpt"))
    _stage_events_json(spark, sf_dir, stage)

    raw = spark.readStream.schema(EVENTS).option("maxFilesPerTrigger", 1).json(stage)
    typed = raw.select(
        "event_id",
        F.to_timestamp_ntz("ts").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )
    q = (
        typed.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(sink).orderBy("event_id")
    # materialize before the temp stage/checkpoint go away
    result = spark.createDataFrame(out.collect(), out.schema).orderBy("event_id")
    shutil.rmtree(work, ignore_errors=True)
    return result
