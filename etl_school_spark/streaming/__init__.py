"""Structured Streaming surface (SURVEY.md §2.9).

The reference's streaming stack — SQLite message broker (assignment3),
Snowpipe serverless ingest, and the Snowflake streams/tasks CDC pipeline
(assignment4) — all collapse onto file-source Structured Streaming:
publish = drop a file on the topic dir; consume = a checkpointed streaming
query; stream offsets = the checkpoint; ``system$stream_has_data`` = empty
micro-batches are no-ops.
"""

from etl_school_spark.streaming.broker import FileBroker  # noqa: F401
from etl_school_spark.streaming.pipelines import incremental_ingest  # noqa: F401
