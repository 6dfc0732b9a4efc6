"""Streaming surface tests: broker roundtrip, incremental checkpointing."""

from __future__ import annotations

import json
import os

import pytest

from etl_school_spark.schemas import CC_PAYLOAD


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def test_broker_publish_consume_roundtrip(spark, workdir):
    from etl_school_spark.sources.generator import gen_cc_events
    from etl_school_spark.streaming.broker import FileBroker

    broker = FileBroker(spark, os.path.join(workdir, "broker"))
    broker.create_topic("cc")
    records = gen_cc_events(50, seed=1)
    assert broker.publish("cc", records) == 50

    sink = os.path.join(workdir, "sink")
    broker.consume_available("cc", CC_PAYLOAD, "group_a", sink)
    got = spark.read.parquet(sink)
    assert got.count() == 50
    stats = broker.stats("cc")
    assert stats["published"] == 50
    assert stats["delivered_by_group"] == {"group_a": 50}
    assert stats["pending_by_group"] == {"group_a": 0}


def test_broker_exactly_once_per_group(spark, workdir):
    """Re-draining the same group consumes nothing new; a second group gets
    its own full copy (consumer_offsets semantics)."""
    from etl_school_spark.sources.generator import gen_cc_events
    from etl_school_spark.streaming.broker import FileBroker

    broker = FileBroker(spark, os.path.join(workdir, "broker"))
    broker.publish("cc", gen_cc_events(20, seed=2))
    sink_a = os.path.join(workdir, "sink_a")
    broker.consume_available("cc", CC_PAYLOAD, "group_a", sink_a)
    broker.consume_available("cc", CC_PAYLOAD, "group_a", sink_a)  # no-op drain
    assert spark.read.parquet(sink_a).count() == 20

    broker.publish("cc", gen_cc_events(10, seed=3))
    broker.consume_available("cc", CC_PAYLOAD, "group_a", sink_a)  # only the delta
    assert spark.read.parquet(sink_a).count() == 30

    sink_b = os.path.join(workdir, "sink_b")
    broker.consume_available("cc", CC_PAYLOAD, "group_b", sink_b)  # full copy
    assert spark.read.parquet(sink_b).count() == 30


def test_incremental_ingest_cdc(spark, workdir):
    """Stage→flatten→sink processes only new files on re-run (T1/T2)."""
    from etl_school_spark.sources.generator import gen_cc_events
    from etl_school_spark.streaming.pipelines import incremental_ingest

    stage = os.path.join(workdir, "stage")
    sink = os.path.join(workdir, "sink")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(stage)

    def drop_file(name, events):
        with open(os.path.join(stage, name), "w") as fh:
            for e in events:
                fh.write(json.dumps(e) + "\n")

    drop_file("cc_txn_0.json", gen_cc_events(30, seed=4))
    incremental_ingest(spark, stage, sink, ckpt)
    first = spark.read.parquet(sink)
    assert first.count() == 30
    assert {"txn_id", "amount", "txn_ts", "approved", "card_number"} <= set(first.columns)

    drop_file("cc_txn_1.json", gen_cc_events(12, seed=5))
    incremental_ingest(spark, stage, sink, ckpt)
    assert spark.read.parquet(sink).count() == 42


def test_incremental_ingest_pattern_prunes_files(spark, workdir):
    from etl_school_spark.sources.generator import gen_cc_events
    from etl_school_spark.streaming.pipelines import incremental_ingest

    stage = os.path.join(workdir, "stage")
    os.makedirs(stage)
    with open(os.path.join(stage, "cc_txn_good.json"), "w") as fh:
        for e in gen_cc_events(5, seed=6):
            fh.write(json.dumps(e) + "\n")
    with open(os.path.join(stage, "unrelated.txt"), "w") as fh:
        fh.write("not json\n")
    incremental_ingest(
        spark,
        stage,
        os.path.join(workdir, "sink"),
        os.path.join(workdir, "ckpt"),
        pattern="cc_txn_*.json",
    )
    assert spark.read.parquet(os.path.join(workdir, "sink")).count() == 5
