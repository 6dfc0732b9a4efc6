"""Kafka source variant of the broker ingest path.

The reference's broker is itself a SQLite-backed emulation
(assignment3/simple_kafka_setup.py:40-177 — topics/publish/subscribe
tables), which etl_school_spark.streaming.broker mirrors with a
file-backed implementation. A production deployment of the same pipeline
reads the real thing: ``spark.readStream.format("kafka")``. This module
provides that path behind availability detection — the spark-sql-kafka
connector jar is not shipped in this environment, so construction is
split into pure option plumbing (unit-testable anywhere) and the guarded
reader, with the file-source stage as the documented fallback.

At scale the kafka path is the right source shape: one Spark input
partition per Kafka partition, offsets tracked in the checkpoint
(exactly-once with idempotent sinks), no file-listing cost per batch.

End-to-end status (r4 audit): a real-broker smoke test is NOT runnable
in this environment and the constraint is structural, not a TODO —
no spark-sql-kafka / kafka-clients jar on the classpath, no broker
binary installed, and package installation is unavailable. The verified
ceiling is therefore (a) the pure option-plumbing unit tests and (b)
the mocked-classpath probe of ``kafka_available``/``kafka_stream``
(tests/test_streaming.py). On a cluster with the connector jar the
reader construction below is the standard documented form; the file
broker remains the tested fallback, which is also full parity with the
reference's SQLite broker emulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_KAFKA_PROVIDER = "org.apache.spark.sql.kafka010.KafkaSourceProvider"


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_KAFKA_PROVIDER)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def kafka_reader_options(
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The exact option set the kafka reader is configured with — pure,
    so the plumbing is unit-testable without the connector."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # fail loudly on truncated/expired offsets instead of silently
        # skipping data — at-least-once beats silent gaps
        "failOnDataLoss": "true",
    }
    if max_offsets_per_trigger is not None:
        # per-batch rate limit — the kafka analog of maxFilesPerTrigger
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_topic_stream(
    spark: SparkSession,
    schema: StructType,
    brokers: str = "localhost:9092",
    topic: str = "events",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fallback_stage_dir: str | None = None,
) -> DataFrame:
    """Streaming DataFrame of JSON payloads from ``topic``, typed by
    ``schema`` — or the file-source stage fallback with the SAME output
    columns when the connector is absent, so every downstream
    transform/sink is source-agnostic."""
    if kafka_available(spark):
        raw = (
            spark.readStream.format("kafka")
            .options(
                **kafka_reader_options(
                    brokers, topic, starting_offsets, max_offsets_per_trigger
                )
            )
            .load()
        )
        return raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("payload")
        ).select("payload.*")
    if fallback_stage_dir is None:
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath and no "
            "fallback_stage_dir given; install the connector or point at "
            "a staged-file topic directory"
        )
    return spark.readStream.schema(schema).json(fallback_stage_dir)
