"""Streaming corpus build: the batch pipeline's front stages composed on
a ``readStream`` source, so a continuously arriving crawl lands as
filtered, scrubbed, exact-deduped, sharded documents without a batch
window in between.

    raw doc stream
      → C4/Gopher quality filter   (functions/corpus.filter_corpus)
      → PII scrubbing              (privacy.scrub_corpus)
      → exact dedup                (watermarked state on the content
                                    fingerprint)
      → shard assignment + token count (pure per-row functions)
      → partitioned parquet sink   (stream_corpus_to_shards)

Filter and scrub are pure projections — already proven streaming-safe
(tests/test_quality_privacy.py runs them on readStream). Exact dedup is
the one stateful stage: ``dropDuplicatesWithinWatermark`` on the
fingerprint when an event-time column is available (state expires at the
watermark horizon — the bounded-state form a 24/7 ingest needs), plain
``dropDuplicates`` otherwise (state grows with distinct fingerprints;
fine for bounded replays, documented here rather than hidden).

DELIBERATE exclusions, and why (parity with pipeline.build_corpus):
- near-dup dedup needs the iterative pair/cluster pipeline over the
  whole corpus — not expressible as bounded streaming state;
- concat-and-chunk packing needs the CLOSED shard's total hash order
  for its running token sum — a property no unbounded stream has;
- the CCNet perplexity gate (r7) needs a per-document lag window +
  aggregation — semantically per-row (no cross-doc state) but on
  Spark's unsupported-operation list for unbounded streams, so it runs
  where micro-batches are batch frames: ``stream_corpus_with_index``
  applies it inside foreachBatch via the same ``functions.lm.ppl_gate``
  as the batch build (gate parity asserted by the round-trip test).
Near-dup and packing remain batch finalizations over the streamed-in
shard directories (run pipeline.build_corpus stages on the sink when a
training snapshot is cut). The streamed stages and the batch build
agree exactly on what they both compute — asserted by the availableNow
round-trip test.

Reference analog: the reference's CDC-stream → task → table pattern
(SURVEY §2 T1-T2); this is that pattern applied to the corpus surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from pyspark.sql import functions as F

from etl_school_spark.functions.corpus import filter_corpus
from etl_school_spark.functions.sampling import shard_id
from etl_school_spark.functions.text import fingerprint, token_count
from etl_school_spark.privacy import scrub_corpus


def build_corpus_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
    watermark_delay: str = "10 minutes",
    n_shards: int = 8,
    **filter_thresholds,
) -> DataFrame:
    """Compose the streaming corpus stages over ``docs`` (typically a
    ``readStream`` frame; also works on a batch frame for twin tests).
    Returns the sink-ready frame: surviving scrubbed documents with
    ``fp``, ``shard`` and ``n_tokens``."""
    out = filter_corpus(docs, text_col, **filter_thresholds)
    out = scrub_corpus(out, text_col)
    out = out.withColumn("fp", fingerprint(text_col))
    if ts_col is not None and out.isStreaming:
        out = out.withWatermark(ts_col, watermark_delay)
        out = out.dropDuplicatesWithinWatermark(["fp"])
    else:
        out = out.dropDuplicates(["fp"])
    return out.withColumn("shard", shard_id(id_col, n_shards)).withColumn(
        "n_tokens", token_count(text_col).cast("long")
    )


def stream_corpus_with_index(
    stream: DataFrame,
    corpus_path: str,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    available_now: bool = True,
    ppl_lm_path: str | None = None,
    max_ppl: float | None = None,
    **filter_thresholds,
) -> StreamingQuery:
    """The full continual-ingestion loop: every micro-batch is quality-
    filtered, PII-scrubbed, then deduplicated — exact AND near-dup —
    against the PERSISTED acceptance index (dedup/incremental.py) and
    within itself; accepted docs land under ``corpus_path`` and their
    index rows under ``index_path``, which is exactly the state the next
    micro-batch (or the next job run, or a batch backfill) dedups
    against.

    foreachBatch rather than a stateful operator, deliberately: the
    dedup state is the durable index TABLE — a multi-TB corpus index
    does not fit a streaming state store, and the table form keeps
    streaming and batch acceptance byte-compatible (either can extend
    the same index).

    ``ppl_lm_path`` + ``max_ppl`` (r7): the CCNet-style model gate, at
    parity with ``pipeline.build_corpus(ppl_lm=..., max_ppl=...)`` — a
    BigramLM persisted with ``functions.lm.save_bigram_lm`` is loaded
    per micro-batch (plain parquet scans; a retrained model at the same
    path takes effect on the next batch) and applied via the SAME
    ``ppl_gate`` at the SAME stage position (after the rule battery,
    before scrubbing), so streamed and batch acceptance agree by
    construction. The gate lives here, in foreachBatch, because per-doc
    perplexity needs a per-document window + aggregation — on Spark's
    unsupported-operation list for unbounded streams, but plain batch
    ops on a micro-batch.

    Retry semantics: foreachBatch re-runs a batch on failure, so both
    writes go to batch-id-named partition directories with overwrite —
    a retried batch overwrites its own partial output instead of
    appending twice, and the index read spans every committed batch
    partition. The one cross-write hazard left (corpus partition
    committed, index partition lost mid-crash, retry then sees its own
    corpus rows as new) is closed by the same overwrite: the retry
    re-derives BOTH partitions from the batch's input, not from what
    survived the crash."""
    from etl_school_spark.dedup.incremental import (
        build_dedup_index,
        dedup_batch_against_index,
        release_batch_checkpoints,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cleaned = filter_corpus(batch_df, text_col, **filter_thresholds)
        if ppl_lm_path is not None and max_ppl is not None:
            from etl_school_spark.functions.lm import load_bigram_lm, ppl_gate

            cleaned = ppl_gate(
                cleaned, load_bigram_lm(spark, ppl_lm_path), max_ppl, id_col, text_col
            )
        cleaned = scrub_corpus(cleaned, text_col)
        try:
            index = spark.read.parquet(index_path).select(
                "doc", "fp", "shingles", "set_size", "sig"
            )
        except Exception:
            # bootstrap: empty index with the right schema
            index = build_dedup_index(cleaned.limit(0), id_col, text_col)
        accepted, rows = dedup_batch_against_index(
            cleaned, index, threshold=threshold, id_col=id_col, text_col=text_col
        )
        accepted.write.mode("overwrite").parquet(f"{corpus_path}/batch={batch_id}")
        rows.write.mode("overwrite").parquet(f"{index_path}/batch={batch_id}")
        # both writes committed — the parquet partitions are the durable
        # state and a retry rebuilds fresh frames, so the batch's
        # truncation blocks are dead weight from here; free them NOW
        # instead of accumulating one set per micro-batch until driver
        # GC notices (r9, incremental.py "Checkpoint-block lifecycle")
        release_batch_checkpoints(accepted, rows)

    w = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_corpus_to_shards(
    stream: DataFrame, path: str, checkpoint: str, available_now: bool = True
) -> StreamingQuery:
    """Start the shard-partitioned parquet sink: one directory per shard,
    exactly-once via the checkpoint. ``available_now`` drains whatever
    the source currently holds and stops — the replay/backfill trigger;
    pass False for the continuous micro-batch form."""
    w = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("shard")
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
