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


def test_build_corpus_ppl_gate(spark):
    """r4 optional LM quality gate: with a reference model and a max_ppl
    cut, the gibberish twin of a fluent doc (passes every rule heuristic
    — same tokens!) is dropped while the fluent docs survive; without
    the gate both survive. Short no-evidence docs are untouched."""
    import random

    from etl_school_spark.functions.lm import perplexity_scores, train_bigram_lm
    from etl_school_spark.pipeline import build_corpus

    base = (
        "the cat sat on the mat and the dog sat on the rug . "
        "the bird sang in the tree and the fish swam in the pond . "
    ) * 4
    rng = random.Random(7)
    shuffled = base.split()
    rng.shuffle(shuffled)
    gibberish = " ".join(shuffled)

    ref = spark.createDataFrame(
        [(i, base) for i in range(10)], "doc_id long, text string"
    )
    lm = train_bigram_lm(ref, vocab_size=100)

    docs = spark.createDataFrame(
        [(1, base), (2, base + "extra tail ."), (3, gibberish)],
        "doc_id long, text string",
    )
    lax = dict(
        min_tokens=5, min_mean_word_len=0.0, min_stopword_share=0.0,
        min_alpha_share=0.0, max_top_word_share=1.0,
        max_top_bigram_share=1.0, max_dup_trigram_frac=1.0,
    )
    no_gate = build_corpus(docs, near_dedup=False, **lax)
    assert {r.doc_id for r in no_gate.collect()} == {1, 2, 3}

    # cut between the fluent and shuffled scores
    ppls = {r.doc_id: r.ppl for r in perplexity_scores(docs, lm).collect()}
    cut = (max(ppls[1], ppls[2]) + ppls[3]) / 2
    assert ppls[3] > cut > max(ppls[1], ppls[2])
    gated = build_corpus(docs, near_dedup=False, ppl_lm=lm, max_ppl=cut, **lax)
    assert {r.doc_id for r in gated.collect()} == {1, 2}
