"""End-to-end corpus build (etl_school_spark/pipeline.py): the composed
filter → scrub → dedup → reshard → pack chain over real test data."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_school_spark.pipeline import build_corpus, drop_near_duplicates, write_corpus_shards
from etl_school_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def test_build_corpus_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    built = build_corpus(docs, n_shards=4, pack_capacity=256, near_dedup=True)
    rows = built.collect()
    n_raw = docs.count()

    # stages only ever DROP rows, and something must survive
    assert 0 < len(rows) < n_raw
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))

    # exact dedup held: normalized-text fingerprints are unique
    fps = {
        hashlib.md5(" ".join(r.text.split()).lower().encode()).hexdigest()
        for r in rows
    }
    assert len(fps) == len(rows)

    # every surviving doc passes the filter battery (spot-check: length)
    assert all(len(r.text.split()) >= 50 for r in rows)

    # shard layout: 4 shards, spans never invert, windows start at 0
    assert {r.shard for r in rows} <= set(range(4))
    assert all(r.first_window <= r.last_window for r in rows)
    assert min(r.first_window for r in rows) == 0

    # determinism: a re-run from a differently-partitioned input is
    # row-identical (the whole pipeline is content-keyed)
    again = build_corpus(docs.repartition(13), n_shards=4, pack_capacity=256, near_dedup=True)
    key = lambda r: (r.doc_id, r.shard, r.first_window, r.last_window, r.text)
    assert sorted(map(key, rows)) == sorted(map(key, again.collect()))

    # write → one directory per shard, re-read round-trips
    out = str(tmp_path / "corpus")
    write_corpus_shards(built, out)
    back = spark.read.parquet(out)
    assert back.count() == len(rows)
    assert {r.shard for r in back.select("shard").distinct().collect()} == {
        r.shard for r in rows
    }

    # ONE full-text shuffle: pack's window reuses reshard's partitioning
    # (pack_concat_windows keeps the existing `shard` column), so exactly
    # one exchange hash-partitions on shard — a second one would double
    # the dominant shuffle at corpus scale
    plan = (
        build_corpus(docs, n_shards=4, pack_capacity=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning(shard") == 1, plan


def test_drop_near_duplicates_keeps_best_quality(spark):
    """Planted near-dup pair: the higher-quality copy survives."""
    base = (
        "the quick brown fox jumps over a lazy dog and then runs far away "
        "to find some food in the deep green forest near a quiet river "
        "where it is safe and the sun is warm and the grass is soft today "
        "and every animal of the forest knows it well and it is happy there"
    )
    # doc 2 = doc 1 with a tiny edit (near-dup); doc 3 unrelated
    rows = [
        (1, base + " extra trailing words of low diversity the the the the"),
        (2, base),
        (3, "completely different text about completely different things entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in drop_near_duplicates(df, threshold=0.5).collect())
    assert 3 in kept  # unclustered passes through
    assert len([k for k in kept if k in (1, 2)]) == 1  # one of the pair survives
