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

import atexit
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

# Streaming sinks live under ONE session-scoped root removed at
# interpreter exit, so registered queries can return LAZY reads over
# their sinks (no driver-side collect in any checked query path — the
# r1 wrappers collected only because their temp dirs were deleted
# before the caller consumed the result).
_WORK_ROOT: str | None = None


def _session_workdir(prefix: str) -> str:
    global _WORK_ROOT
    if _WORK_ROOT is None:
        _WORK_ROOT = tempfile.mkdtemp(prefix="etl_stream_session_")
        atexit.register(shutil.rmtree, _WORK_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_WORK_ROOT)


def _stage_events_json(
    spark: SparkSession, sf_dir: str, stage_dir: str, n_files: int = 3
) -> None:
    """Write the first N events as JSON-lines files onto the stage
    (``n_files`` source files; 1 guarantees a single micro-batch — a
    file is never split across batches)."""
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
    per_file = (len(ev) + n_files - 1) // n_files
    for fi in range(n_files):
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
    work = _session_workdir("ingest_")
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

    return spark.read.parquet(sink).orderBy("event_id")


def _staged_stream(
    spark: SparkSession,
    sf_dir: str,
    work: str,
    max_files: int | None = 1,
    n_stage_files: int = 3,
):
    """Stage the event subset and open a file stream with an absolute
    (tz-independent) event-time column ``ts_abs``. ``max_files=1`` gives
    one micro-batch per staged file; None drains without a rate limit."""
    stage = os.path.join(work, "stage")
    _stage_events_json(spark, sf_dir, stage, n_files=n_stage_files)
    reader = spark.readStream.schema(EVENTS)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    raw = reader.json(stage)
    return raw.select(
        "event_id",
        "user_id",
        "event_type",
        # NTZ string → epoch micros (NTZ epoch diff, session-tz-independent)
        # → absolute TIMESTAMP, the type watermarks require
        F.timestamp_micros(
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', to_timestamp_ntz(ts))")
        ).alias("ts_abs"),
    )


@_q(
    "streaming_windowed_counts",
    f"""
    WITH e AS (
      SELECT epoch_us(ts) AS us, event_type FROM events WHERE event_id < {_N_STREAM_EVENTS}
    )
    SELECT (us // 3600000000) * 3600000000 AS ws_us, event_type, COUNT(*) AS n
    FROM e
    GROUP BY ws_us, event_type
    HAVING ws_us + 3600000000 <= (SELECT max(us) FROM e) - 600000000
    ORDER BY ws_us, event_type
    """,
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension: watermarked tumbling-window aggregation, append mode.

    Hour windows close (emit exactly once) when the 10-minute watermark
    passes the window end — the oracle replicates emitted = {windows with
    end <= max(event_time) - delay}. At scale this runs with bounded
    state: closed windows are evicted, late rows beyond the watermark are
    dropped instead of growing state forever (the drop path is covered by
    tests/test_streaming.py with controlled batch boundaries).

    The backlog MUST drain in one data batch (a mid-stream watermark
    advance would drop oracle-counted late rows), so the input is staged
    as a SINGLE file — a file is never split across micro-batches — and
    no rate limit is set; the trailing no-data batch performs the
    eviction.
    """
    work = _session_workdir("wcounts_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    typed = _staged_stream(spark, sf_dir, work, max_files=None, n_stage_files=1)
    agg = (
        typed.withWatermark("ts_abs", "10 minutes")
        .groupBy(F.window("ts_abs", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros("w.start").alias("ws_us"), "event_type", "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink).orderBy("ws_us", "event_type")


@_q(
    "streaming_stateful_user_counts",
    f"""
    SELECT user_id, COUNT(*) AS n
    FROM events WHERE event_id < {_N_STREAM_EVENTS}
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def streaming_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a per-user
    GroupState counter updated across micro-batches, emitting the running
    total each batch (update mode). The final total per user must equal
    the batch GROUP BY — which is the oracle.

    State is partitioned by user_id (shuffle once per batch), O(#users)
    rows held in the state store, never on the driver.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    work = _session_workdir("stateful_")
    sink = os.path.join(work, "sink")
    ckpt = os.path.join(work, "ckpt")
    typed = _staged_stream(spark, sf_dir, work)

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    counts = typed.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(lambda bdf, _bid: bdf.write.mode("append").parquet(sink))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # running totals are monotone per user; the max is the final count
    return (
        spark.read.parquet(sink)
        .groupBy("user_id")
        .agg(F.max("n").alias("n"))
        .orderBy("user_id")
    )


@_q(
    "streaming_dedup_ingest",
    f"""
    SELECT event_id, user_id, event_type
    FROM events WHERE event_id < {_N_STREAM_EVENTS}
    ORDER BY event_id
    """,
)
def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: the stage holds every event TWICE (re-delivery /
    at-least-once upstream), and the stream emits each exactly once via
    watermarked dropDuplicates — state holds only ids within the
    watermark horizon, so memory stays bounded on an infinite stream.
    Duplicates arriving after their id is evicted are late-dropped, which
    also yields exactly one copy. The oracle is the distinct batch set.
    """
    work = _session_workdir("dedup_")
    stage, sink, ckpt = (os.path.join(work, d) for d in ("stage", "sink", "ckpt"))
    _stage_events_json(spark, sf_dir, stage)
    # duplicate the entire backlog into a second file (same events again)
    import glob as _glob

    dup = os.path.join(stage, "zz_redelivery.json")
    with open(dup, "w") as out_fh:
        for f in sorted(_glob.glob(os.path.join(stage, "events_*.json"))):
            with open(f) as in_fh:
                out_fh.write(in_fh.read())

    typed = (
        spark.readStream.schema(EVENTS)
        .json(stage)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', to_timestamp_ntz(ts))"
                )
            ).alias("ts_abs"),
        )
        .withWatermark("ts_abs", "1 hour")
        .dropDuplicates(["event_id"])
        .drop("ts_abs")
    )
    q = (
        typed.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink).orderBy("event_id")


@_q(
    "continuous_hourly_rollup",
    f"""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value
    FROM events WHERE event_id < {_N_STREAM_EVENTS}
    GROUP BY bucket, event_type
    ORDER BY bucket, event_type
    """,
)
def continuous_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the staged stream maintains
    a materialized hourly rollup by merging each micro-batch into only
    the touched hour partitions (dynamic partition overwrite). The final
    materialized table must equal the one-shot batch GROUP BY — the
    oracle."""
    from etl_school_spark.streaming.rollup import continuous_rollup, read_rollup

    work = _session_workdir("rollup_")
    stage = os.path.join(work, "stage")
    _stage_events_json(spark, sf_dir, stage)
    continuous_rollup(spark, stage, os.path.join(work, "rollup"), os.path.join(work, "ckpt"))
    return read_rollup(spark, os.path.join(work, "rollup")).orderBy("bucket", "event_type")
