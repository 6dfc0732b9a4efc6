"""Incremental dedup against a persisted corpus index — the continual-
ingestion shape a production training pipeline actually runs: a corpus
is accepted once, then every new crawl batch must deduplicate BOTH
within itself AND against everything already accepted, without
re-scanning, re-shingling, or re-hashing the historical text.

The index is one parquet-able frame holding, per accepted document,
exactly the per-doc state the batch dedup pipeline computes anyway —
persisted instead of discarded:

    doc        the accepted document's id
    fp         exact content fingerprint (md5 of normalized text)
    shingles   distinct word n-grams (the exact-Jaccard verify set)
    set_size   |shingles|
    sig        minhash signature (array<long>, seeded permutations)

Batch acceptance then touches history ONLY through index columns:

1. exact:    anti-join new fingerprints against index fingerprints —
             a shuffle of md5 strings, not text; within-batch exact
             dups keep the lowest id.
2. near-dup vs history: band the new signatures AND the stored index
             signatures (banding is a pure projection of `sig` —
             minhash.band_rows), bucket-join new×index, verify exact
             Jaccard on the stored shingle sets, drop every new doc
             matching ANY accepted doc. History wins by construction —
             the accepted corpus is immutable, so there is no
             canonical-choice ambiguity.
3. within-batch near-dup: the ordinary pair + connected-components +
             min-id canonical pass over the (already shrunk) survivors.

At 100 TB the index is ~1-2 KB per accepted doc and is itself a plain
partitioned table; step 2's join cost is O(new_batch × bands) skinny
rows against the index's band projection, never O(corpus).

Reference analog: none (the reference has no corpus surface); this
extends the engine's dedup family from one-shot to continual form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_school_spark.dedup.minhash import (
    band_rows,
    minhash_signatures,
    verify_jaccard_pairs,
)
from etl_school_spark.dedup.cluster import operator_leaf
from etl_school_spark.dedup.ngram import shingle_sets
from etl_school_spark.functions.text import fingerprint


def build_dedup_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 128,
) -> DataFrame:
    """Per-doc dedup state (doc, fp, shingles, set_size, sig) for ``docs``
    — the frame a pipeline persists as its acceptance index. Documents
    with no shingles (shorter than ``n`` words) carry a NULL sig and
    participate only in exact dedup.

    sig_form="arrow" (r10): the index is built ONCE and materialized
    (persisted table in production; localCheckpoint in the pipeline),
    which is exactly the single-materialization shape where the Arrow
    signature form wins — it collapses the 128-perm expression tree to
    one UDF node, cutting ~4–5 s of per-build plan analysis that
    dominated the registered query's driver cost (the r10 per-stage
    profile: distributed execution sums to ~3 s while plan
    construction held an 8–11 s floor). Measured on the full
    registered incremental query at sf1: 17.1 → 13.1 s median (×0.77,
    same-session A/B). Sig values are bit-identical (test-pinned), so
    an index built by either form interoperates with the other."""
    sets = shingle_sets(docs, id_col, text_col, n)
    signed = minhash_signatures(sets, num_perm, sig_form="arrow")
    fps = docs.select(
        F.col(id_col).alias("doc"), fingerprint(text_col).alias("fp")
    )
    return fps.join(signed, "doc")


def _history_band_candidates(
    surv: DataFrame,
    index: DataFrame,
    num_perm: int,
    bands: int,
) -> DataFrame:
    """Candidate (new_doc, old_doc) pairs colliding in ≥1 LSH band:
    SKINNY (doc, band_idx, band_hash) rows on both sides, then a
    dropDuplicates exchange on the matched pairs.

    Measured decision (r7, tools/bench_incremental_shapes.py): the r5
    first-collision variant — both exploded sides carrying their full
    band-hash arrays so a pure filter emits each pair once — is ~20%
    SLOWER end-to-end at sf0.1 (14.1 s vs 11.3 s) and sf1 (39.9 s vs
    33.2 s, 25k-doc index / 42k-doc batch): band collisions between a
    batch and a mostly-disjoint history are rare, so the candidate
    dropDuplicates exchange is tiny while the carried arrays widen EVERY
    exploded shuffle row ~(bands+1)×. A carry-batch-side-only hybrid
    (re-joining the index array onto matched rows) measured between the
    two (12.99 s / 38.4 s). First-collision remains the right pattern
    where collisions are the common case (simhash.py, knn.py); here the
    skinny + dedup shape wins at every measured scale."""
    nb = band_rows(
        surv.filter(F.col("sig").isNotNull()), num_perm, bands
    ).withColumnRenamed("doc", "new_doc")
    ib = band_rows(
        index.filter(F.col("sig").isNotNull()), num_perm, bands
    ).withColumnRenamed("doc", "old_doc")
    return (
        nb.join(ib, ["band_idx", "band_hash"])
        .select("new_doc", "old_doc")
        .dropDuplicates(["new_doc", "old_doc"])
    )


def dedup_batch_against_index(
    new_docs: DataFrame,
    index: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    stage_clock: dict | None = None,
    truncate_stages: bool = True,
    batch_index: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Accept the subset of ``new_docs`` that duplicates neither the
    accepted corpus (``index``) nor an earlier-accepted member of the
    batch itself. Returns (accepted_docs, accepted_index_rows) — union
    the latter onto the index for the next batch.

    Exact dups (same fingerprint) and near-dups (Jaccard ≥ threshold on
    word ``n``-gram sets, minhash/LSH candidates, exact verify) are both
    removed; within the batch the lowest id of each duplicate component
    is the canonical survivor (the batch pipeline's decision rule).

    ``index`` is referenced three times (fingerprints, band projection,
    shingle verify) — pass a MATERIALIZED frame (read from the persisted
    index table, as production does; tests localCheckpoint it). The
    batch's own per-doc state is computed once and lineage-truncated
    here: it feeds every later stage, and the 128-permutation signature
    expression re-analyzed per reference is a driver-heap hazard, not a
    recompute nicety (observed: analyzer OOM on an unmaterialized
    composition).

    Acceptance-order semantics (inherent to incremental dedup): a new
    doc is judged against HISTORY and against batch members that
    survive; it is not transitively linked through batch members that
    history already disqualified. A one-shot rebuild over the union can
    therefore merge components this form keeps separate — the standard
    continual-ingestion tradeoff, stated rather than hidden.

    Checkpoint-block lifecycle (r9, closing the r8 ADVICE): the three
    stage-boundary truncations are lazy (eager=False — they
    materialize at the caller's first action), so this function cannot
    release anything itself; instead both returned frames carry the
    checkpoint handles in ``_esp_checkpoints``, and a caller that is
    DONE with a batch (all actions run, outputs persisted) reclaims
    the blocks immediately with ``release_batch_checkpoints`` — the
    streaming loop (streaming/corpus.py) does so after each
    micro-batch's writes, so a long-lived session replaying many
    batches holds only the live batch's blocks. Callers that skip the
    release rely on driver GC + ContextCleaner, which eventually
    reclaims the (batch-sized, never corpus-sized) sets once the
    frames are collected.

    ``stage_clock`` (r10, diagnosis-only): when a dict is passed, each
    stage-boundary checkpoint is FORCED (one count) and its wall time
    recorded under the stage's name — the per-stage instrument for
    chasing sweep-to-sweep variance (SCALING.md r10). Forcing changes
    only WHEN the lazy checkpoints materialize, not what they hold, so
    the output is identical; leave None in production paths.
    """
    import time as _time

    def _tick(df: DataFrame, name: str) -> None:
        if stage_clock is not None:
            t0 = _time.time()
            df.count()
            stage_clock[name] = round(_time.time() - t0, 3)

    # operator_leaf (r14, VERDICT item 2): every stage-boundary
    # truncation in this pipeline honors the durable-checkpoint conf —
    # on a real cluster with spark.etl_school.checkpoint_dir set, an
    # executor loss mid-batch no longer invalidates truncated lineage.
    # ``batch_index`` (r15, guide §2.6): a caller that also builds the
    # HISTORY index in the same session can construct both per-doc
    # index leaves concurrently (they are independent jobs — Spark's
    # scheduler overlaps them from two driver threads) and inject the
    # batch's here; it must be operator_leaf(build_dedup_index(new_docs,
    # ...)) with the same parameters. None keeps the serial in-call
    # build, byte-identical to r14.
    new_idx = (
        batch_index
        if batch_index is not None
        else operator_leaf(build_dedup_index(new_docs, id_col, text_col, n, num_perm))
    )
    _tick(new_idx, "s1_batch_index")

    # 1a. exact vs history: fingerprint anti-join
    surv = new_idx.join(index.select("fp"), "fp", "left_anti")
    # 1b. exact within batch: lowest id per fingerprint. Null-text docs
    # (null fp) are OUT OF CONTRACT for exact dedup: the anti-join never
    # matches them (they all reach here), and lumping them into one null
    # group would silently treat distinct null-text docs as copies of
    # each other — they bypass the canonical pass instead, each
    # surviving as its own document.
    null_fp = surv.filter(F.col("fp").isNull())
    canon = (
        surv.filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.min("doc").alias("doc"))
    )
    surv = surv.join(canon.select("doc"), "doc", "left_semi").unionByName(null_fp)
    # stage-boundary lineage truncation (r8): every later stage references
    # `surv` ~3× (band projection, verify shingle lookup, anti-join left
    # side), so WITHOUT truncation the plan tree multiplies ~3× per stage
    # — measured 93k formatted-plan lines / ~17k Exchange nodes and ~10 s
    # of pure plan compilation per run at sf0.01 (data-independent, it
    # dwarfed the actual sf0.01 execution). Truncating at each stage
    # boundary keeps the tree additive. The checkpointed frame is
    # batch-sized (never corpus-sized) state the stage computed anyway.
    # RE-MEASURED r11 after the arrow sig form shrank the subtree
    # (tools/ab_incremental_truncate.py, sf1, same-session medians of
    # 3, outputs equal): truncate 10.43 s vs no-truncate 14.74 s — the
    # per-stage toRdd cost (~8 s of codegen compile + broadcast builds)
    # is still CHEAPER than the multiplied re-analysis + re-execution
    # of the untruncated tree across the pipeline's actions, so the
    # truncation default stands (truncate_stages=True).
    if truncate_stages:
        surv = operator_leaf(surv)
    _tick(surv, "s2_exact")

    # 2. near-dup vs history: band new + stored signatures, bucket-join,
    # exact-Jaccard verify on stored shingle sets; any verified match
    # disqualifies the new doc (history is immutable — it always wins).
    cands = _history_band_candidates(surv, index, num_perm, bands)
    matched = (
        verify_jaccard_pairs(
            cands, surv, index, threshold, a_col="new_doc", b_col="old_doc"
        )
        .select(F.col("new_doc").alias("doc"))
        .distinct()
    )
    surv2 = surv.join(matched, "doc", "left_anti")
    if truncate_stages:
        surv2 = operator_leaf(surv2)
        ckpts = [new_idx, surv, surv2]
    else:
        ckpts = [new_idx]
    _tick(surv2, "s3_history_near")
    surv = surv2

    # 3. near-dup within the surviving batch: pair + components + min-id
    # canonical (the one-shot pipeline's rule, on the shrunk batch)
    from etl_school_spark.dedup.cluster import connected_components
    from etl_school_spark.operators.pairs import pairs_within_groups

    sb = band_rows(surv.filter(F.col("sig").isNotNull()), num_perm, bands)
    pcands = pairs_within_groups(sb, ["band_idx", "band_hash"], "doc")
    # connected_components truncates its edge input internally (it
    # iterates over it), so no checkpoint is needed on `pairs` here
    pairs = verify_jaccard_pairs(pcands, surv, surv, threshold).select(
        "id_a", "id_b"
    )
    if stage_clock is not None and truncate_stages:
        # split the in-batch stage for the variance instrument: the
        # pair+verify pipeline (forced here — checkpointed so the
        # components stage reuses the materialization instead of
        # re-executing) vs the components labeling itself
        pairs = operator_leaf(pairs)
        # register the diagnostic checkpoint so release_batch_checkpoints
        # frees it with the batch (r11: it previously leaked to GC)
        ckpts.append(pairs)
        _tick(pairs, "s3b_pairs_verify")
    # batch-sized edge sets are far under the cap in any sane ingestion
    # config, so the within-batch components resolve driver-side in one
    # collect; a mass-duplicated batch past the cap falls back to the
    # distributed loop (cluster.py collect_cap docstring)
    t_cc = _time.time()
    labels = connected_components(pairs, collect_cap=1_000_000)
    if stage_clock is not None:
        stage_clock["s3c_components"] = round(_time.time() - t_cc, 3)
    losers = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc")
    )
    surv = surv.join(losers, "doc", "left_anti")

    accepted_ids = surv.select("doc")
    accepted = new_docs.join(
        accepted_ids.withColumnRenamed("doc", id_col), id_col, "left_semi"
    )
    # release hook (docstring, "Checkpoint-block lifecycle"): same list
    # on both frames — the batch owns ONE set of truncation points
    accepted._esp_checkpoints = ckpts
    surv._esp_checkpoints = ckpts
    return accepted, surv


def release_batch_checkpoints(*frames: DataFrame) -> int:
    """Free the localCheckpoint blocks a finished batch's frames own
    (``_esp_checkpoints``, set by dedup_batch_against_index). CONTRACT:
    the batch must be DONE — every action on the returned frames (and
    anything derived from them) has run and the outputs are persisted;
    released frames cannot be re-executed. Shared-list semantics make
    the call idempotent across both frames of one batch. Returns the
    number of checkpoint block sets released."""
    from etl_school_spark.dedup.cluster import _release_plan_blocks

    n = 0
    for df in frames:
        handles = getattr(df, "_esp_checkpoints", None)
        if not handles:
            continue
        for ck in list(handles):
            _release_plan_blocks(ck)
            n += 1
        handles.clear()
    return n
