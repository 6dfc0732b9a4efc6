"""Similarity-search tests: exact baseline sanity + LSH recall floor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _emb(spark):
    from etl_school_spark.tables import load_table

    return load_table(spark, SF_SMOKE, "embeddings")


def test_brute_force_topk_contract(spark):
    from etl_school_spark.similarity.knn import brute_force_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    out = brute_force_topk(emb, queries, k=5).collect()
    n_q = queries.count()
    assert len(out) == n_q * 5
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == [1, 2, 3, 4, 5]
        scores = [r.score for r in sorted(rows, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_lsh_topk_recall_floor(spark):
    """bits=4/tables=16 measured ≈0.89 recall on this near-uniform corpus;
    assert a conservative floor so hyperplane regressions get caught."""
    from etl_school_spark.similarity.knn import brute_force_topk, lsh_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in lsh_topk(emb, queries, k=5, bits=4, tables=16).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"LSH recall degraded: {recall:.2f}"


def test_lsh_topk_bucket_gemm_shape(spark):
    """r8: scoring is a per-bucket cogroup gemm (knn.lsh_topk docstring)
    — the plan must contain the cogroup Arrow stage and NO per-candidate
    join of vector payloads. The pair dropDuplicates is allowed (and
    expected) because it runs over the per-bucket top-(k+1) SHORTLIST
    union, never the full candidate space — the r4 concern it replaced
    was a dedup shuffle of every collision row. Result equality with the
    full-candidate scoring is separately pinned by the driver oracle."""
    from etl_school_spark.similarity.knn import lsh_topk

    emb = _emb(spark)
    df = lsh_topk(emb, k=5, bits=4, tables=16, query_filter=F.col("vec_id") % 25 == 0)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "FlatMapCoGroupsInPandas" in analyzed
    # shortlist dedup, not candidate-space dedup: the Deduplicate input
    # is the cogroup output (3 skinny columns), not a join of vectors
    assert "Deduplicate" in analyzed
    rows = df.collect()
    assert len(rows) == len({(r.query_id, r.rank) for r in rows})
    assert len(rows) == len({(r.query_id, r.neighbor_id) for r in rows})
    # every query got a full k results (the corpus is dense enough)
    from collections import Counter

    per_q = Counter(r.query_id for r in rows)
    assert set(per_q.values()) == {5}


def test_lsh_topk_hot_bucket_blocking_invariant(spark):
    """r9: per-bucket corpus-side block tiling (knn.lsh_topk docstring,
    "Per-bucket memory is BOUNDED") must not change the result. Plant a
    HOT bucket far larger than the block size — bits=1/tables=1 puts
    ~half the corpus (≈ 600 rows) into each of two buckets, corpus_block
    32 forces ~19 block passes through the hot bucket — and require
    row-identical output (same neighbors, same ranks, same score BITS)
    vs an effectively unblocked run. This is the planted-straggler proof
    that the per-block shortlist union covers the bucket-wide top-k."""
    from etl_school_spark.similarity.knn import lsh_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)

    def rows(block):
        return sorted(
            map(
                tuple,
                lsh_topk(
                    emb, queries, k=5, bits=1, tables=1, corpus_block=block
                ).collect(),
            )
        )

    blocked = rows(32)
    unblocked = rows(10**9)
    assert blocked == unblocked and len(blocked) > 0


def test_lsh_topk_auto_bits(spark):
    """r9: bits="auto" derives the bucket width from one corpus count so
    expected membership stays ≤ corpus_block as the corpus grows — the
    complementary bound to block tiling. The derivation is a pure
    function (unit-checked here across scales and the 64-bit pool cap),
    and the integration run must equal the explicit-bits run exactly."""
    from etl_school_spark.similarity.knn import _auto_bits, lsh_topk

    # grows with n, targets ~target members/bucket, capped by the pool word
    assert _auto_bits(2_000, 16, 4096) == 1
    assert _auto_bits(100_000, 16, 4096) == 4  # 64 // 16 cap binds
    assert _auto_bits(100_000, 8, 4096) == 5
    assert _auto_bits(100_000_000, 8, 4096) == 8  # 64 // 8 cap binds
    assert _auto_bits(10, 4, 4096) == 1

    emb = _emb(spark)
    n = emb.count()
    auto = sorted(
        map(
            tuple,
            lsh_topk(
                emb, k=5, bits="auto", tables=16,
                query_filter=F.col("vec_id") % 25 == 0,
            ).collect(),
        )
    )
    explicit = sorted(
        map(
            tuple,
            lsh_topk(
                emb, k=5, bits=_auto_bits(n, 16, 4096), tables=16,
                query_filter=F.col("vec_id") % 25 == 0,
            ).collect(),
        )
    )
    assert auto == explicit != []


def test_cosine_matches_numpy(spark):
    import numpy as np

    from etl_school_spark.similarity.knn import cosine_pairs

    emb = _emb(spark).filter(F.col("vec_id") < 30)
    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    got = {(r.id_a, r.id_b): r.cosine_sim for r in cosine_pairs(emb, threshold=-1.0).collect()}
    for (i, j), c in got.items():
        a, b = rows[i], rows[j]
        expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(c - expected) < 1e-9


def test_ivf_topk_recall_floor_and_determinism(spark):
    from etl_school_spark.similarity.knn import brute_force_topk
    from etl_school_spark.similarity.ivf import ivf_topk, train_centroids

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=5, n_cells=16, nprobe=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall degraded: {recall:.2f}"
    # decimal-sum training is partition-order independent → identical twice
    c1 = train_centroids(emb, n_cells=8, iters=1)
    c2 = train_centroids(emb.repartition(7), n_cells=8, iters=1)
    assert c1 == c2


def test_bucketed_pairs_subquadratic_on_clustered_corpus(spark):
    """The 100 TB claim for the near-dup pipeline, demonstrated (r2 verdict
    item 2): on a CLUSTERED corpus at a realistic near-dup threshold
    (0.9), the LSH blocking stage generates ≪ n(n-1)/2 candidates while
    the verified output still equals the brute-force result exactly
    (recall 1.0 on every planted pair). The driver's synthetic embeddings
    are near-uniform (LSH's worst case, see knn.cosine_pairs_bucketed
    docstring); this fixture is what real near-dup corpora look like."""
    import numpy as np

    from etl_school_spark.similarity.knn import (
        cosine_pairs,
        cosine_pairs_bucketed,
        lsh_candidate_pairs,
    )

    rng = np.random.default_rng(11)
    dim, n_clusters, members, n_background = 64, 40, 5, 300
    vecs = []
    for _ in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for _ in range(members):
            v = base + 0.025 * rng.standard_normal(dim)
            vecs.append(v / np.linalg.norm(v))
    for _ in range(n_background):
        v = rng.standard_normal(dim)
        vecs.append(v / np.linalg.norm(v))
    n = len(vecs)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id: long, embedding: array<float>",
    )

    # bits scaled to the threshold (0.9 → 12-bit subsets), as the
    # registered query's docstring prescribes for real corpora
    params = dict(pool_bits=64, n_subsets=64, bits=12)
    n_cand = lsh_candidate_pairs(emb, **params).count()
    all_pairs = n * (n - 1) // 2
    assert n_cand < 0.05 * all_pairs, f"blocking degenerated: {n_cand}/{all_pairs}"

    brute = {(r.id_a, r.id_b): r.cosine_sim for r in cosine_pairs(emb, 0.9).collect()}
    fast = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in cosine_pairs_bucketed(emb, 0.9, **params).collect()
    }
    # planted intra-cluster pairs must all qualify and all be found
    assert len(brute) >= n_clusters * members * (members - 1) // 2
    assert fast == brute


def test_bucketed_pairs_equal_brute_force(spark):
    """The registered near-dup query is the LSH-bucketed pipeline; the
    all-pairs crossJoin survives ONLY here, as its recall yardstick.
    Exact set+score equality is required (the driver's oracle is the
    brute-force SQL)."""
    from etl_school_spark.similarity.knn import cosine_pairs, cosine_pairs_bucketed
    from etl_school_spark.tables import load_table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = load_table(spark, sf, "embeddings")
        brute = {(r.id_a, r.id_b): r.cosine_sim for r in cosine_pairs(emb, 0.4).collect()}
        fast = {
            (r.id_a, r.id_b): r.cosine_sim
            for r in cosine_pairs_bucketed(emb, 0.4).collect()
        }
        assert fast == brute and len(brute) > 0, sf


def test_gemm_topk_matches_relational_baseline(spark):
    """The vectorized (Arrow batch + BLAS gemm) exact ANN must agree with
    the relational brute-force baseline BIT FOR BIT (r4): gemm only
    shortlists, the emitted score is recomputed in the engine's exact
    sequential fold — this is what lets the registered ann_topk_cosine
    run the gemm plan against the unchanged relational oracle."""
    from etl_school_spark.similarity.gemm import gemm_topk
    from etl_school_spark.similarity.knn import brute_force_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    base = {(r.query_id, r.rank): (r.neighbor_id, r.score)
            for r in brute_force_topk(emb, queries, k=5).collect()}
    fast = {(r.query_id, r.rank): (r.neighbor_id, r.score)
            for r in gemm_topk(emb, queries, k=5).collect()}
    assert base == fast


def test_gemm_topk_batch_size_invariant(spark):
    """Correct cross-batch merging: shrinking the Arrow batch size (more
    per-batch top-k fragments) must not change the result."""
    from etl_school_spark.similarity.gemm import gemm_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = spark.conf.get(key, "10000")
    try:
        spark.conf.set(key, "37")
        small = sorted(map(tuple, gemm_topk(emb, queries, k=5).collect()))
    finally:
        spark.conf.set(key, default)
    normal = sorted(map(tuple, gemm_topk(emb, queries, k=5).collect()))
    assert small == normal


def test_gemm_topk_plan_is_arrow_not_row_python(spark):
    """The scale contract: MapInPandas (Arrow-batched) in the plan, never
    row-at-a-time BatchEvalPython."""
    from etl_school_spark.similarity.gemm import gemm_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    plan = gemm_topk(emb, queries, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_cosine_pairs_dense_matches_exact_baseline(spark):
    """Dense-regime block-gemm near-dup pairs: identical (pair, score)
    rows as the exact HOF-fold baseline — bit-for-bit, since r4 the gemm
    only prefilters and survivors are rescored in sequential fold order.
    Exercised single-block AND multi-block (block smaller than the
    corpus → several block passes unioned; coverage must be exactly-once
    with no pair lost at block boundaries)."""
    from etl_school_spark.similarity.gemm import cosine_pairs_dense
    from etl_school_spark.similarity.knn import cosine_pairs

    emb = _emb(spark)
    base = {(r.id_a, r.id_b): r.cosine_sim for r in cosine_pairs(emb, 0.4).collect()}
    assert len(base) > 0
    for block in (4096, 37):  # one block; many ragged blocks
        fast = {}
        for r in cosine_pairs_dense(emb, 0.4, block=block).collect():
            assert (r.id_a, r.id_b) not in fast, "pair emitted twice"
            fast[(r.id_a, r.id_b)] = r.cosine_sim
        assert fast == base, f"block={block}"


def test_cosine_pairs_dense_refuses_oversized_corpus(spark):
    """max_blocks bounds total scan count: a corpus past
    block × max_blocks rows is out of the dense regime by definition and
    must be refused, not silently ground through."""
    import pytest as _pytest

    from etl_school_spark.similarity.gemm import cosine_pairs_dense

    emb = _emb(spark)
    with _pytest.raises(ValueError, match="capped"):
        cosine_pairs_dense(emb, 0.4, block=10, max_blocks=3).collect()


def test_cosine_pairs_auto_dispatch(spark):
    """The dispatcher picks the dense gemm plan on the degenerate
    (near-uniform, low-threshold) corpus and the LSH-bucketed plan on a
    clustered corpus with threshold-scaled bits — and both branches
    return the exact answer."""
    import numpy as np

    from etl_school_spark.similarity.dispatch import cosine_pairs_auto
    from etl_school_spark.similarity.knn import cosine_pairs

    # degenerate regime: driver embeddings at threshold 0.4 → dense plan
    emb = _emb(spark)
    auto = cosine_pairs_auto(emb, 0.4)
    assert "MapInPandas" in auto._jdf.queryExecution().executedPlan().toString()
    base = {(r.id_a, r.id_b): r.cosine_sim for r in cosine_pairs(emb, 0.4).collect()}
    got = {(r.id_a, r.id_b): r.cosine_sim for r in auto.collect()}
    assert got == base

    # sparse regime: clustered corpus, 12-bit subsets → bucketed plan
    rng = np.random.default_rng(5)
    vecs = []
    for _ in range(30):
        b = rng.standard_normal(64)
        b /= np.linalg.norm(b)
        for _ in range(4):
            v = b + 0.02 * rng.standard_normal(64)
            vecs.append(v / np.linalg.norm(v))
    clustered = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id: long, embedding: array<float>",
    )
    auto2 = cosine_pairs_auto(clustered, 0.9, n_subsets=64, bits=12)
    assert "MapInPandas" not in auto2._jdf.queryExecution().executedPlan().toString()
    base2 = {(r.id_a, r.id_b): r.cosine_sim for r in cosine_pairs(clustered, 0.9).collect()}
    got2 = {(r.id_a, r.id_b): r.cosine_sim for r in auto2.collect()}
    assert got2 == base2 and len(base2) > 0


def test_cosine_pairs_auto_probe_memoized(spark):
    """r8: the dispatch density probe — almost entirely data-independent
    driver-side analysis of the hyperplane literals — must run at most
    once per (input plan, probe params) per session. Re-dispatching the
    same frame must hit the memo (no second probe); a DIFFERENT frame
    must miss it (its own probe). Both calls still return the exact
    answer."""
    from etl_school_spark.similarity import dispatch as dsp

    emb = _emb(spark)
    calls = {"n": 0}
    real = dsp.lsh_candidate_density

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    # drop any memo left by earlier tests in this shared session
    if hasattr(spark, "_esp_density_memo"):
        del spark._esp_density_memo
    dsp.lsh_candidate_density = counting
    try:
        r1 = cosine_pairs_auto_rows(dsp, emb)
        assert calls["n"] == 1
        r2 = cosine_pairs_auto_rows(dsp, emb)
        assert calls["n"] == 1  # memo hit — no second probe
        assert r1 == r2
        other = emb.filter(F.col("vec_id") < 40)
        cosine_pairs_auto_rows(dsp, other)
        assert calls["n"] == 2  # different plan — fresh probe
    finally:
        dsp.lsh_candidate_density = real


def cosine_pairs_auto_rows(dsp, frame, **kw):
    return sorted(
        (r.id_a, r.id_b) for r in dsp.cosine_pairs_auto(frame, 0.4, **kw).collect()
    )


def test_cosine_pairs_auto_force_reprobe(spark):
    """r9 staleness escape hatch (a): ``force_reprobe=True`` must bypass
    the memo and re-run the density query (then overwrite the entry), for
    callers who mutate table content under an unchanged analyzed plan."""
    from etl_school_spark.similarity import dispatch as dsp

    emb = _emb(spark)
    calls = {"n": 0}
    real = dsp.lsh_candidate_density

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    if hasattr(spark, "_esp_density_memo"):
        del spark._esp_density_memo
    dsp.lsh_candidate_density = counting
    try:
        r1 = cosine_pairs_auto_rows(dsp, emb)
        assert calls["n"] == 1
        r2 = cosine_pairs_auto_rows(dsp, emb, force_reprobe=True)
        assert calls["n"] == 2  # memo bypassed, probe re-ran
        assert r1 == r2
        cosine_pairs_auto_rows(dsp, emb)
        assert calls["n"] == 2  # refreshed entry serves the next call
    finally:
        dsp.lsh_candidate_density = real


def test_cosine_pairs_auto_evicts_stale_memo_on_dense_cap(spark):
    """r9 staleness escape hatch (b), closing the r8 ADVICE hole: a stale
    memoized count that routes a now-oversized corpus into the dense
    branch hits cosine_pairs_dense's cap ValueError — the dispatcher must
    EVICT the stale entry, re-probe once, and re-dispatch (here: to the
    bucketed branch, which still returns the exact answer) instead of
    leaving the session with a persistent hard failure."""
    from etl_school_spark.similarity import dispatch as dsp
    from etl_school_spark.similarity.knn import cosine_pairs

    emb = _emb(spark)
    calls = {"n": 0}
    real = dsp.lsh_candidate_density

    def stale_then_real(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return (20, 1.0)  # stale: "fits the cap, dense regime"
        return real(*a, **kw)

    if hasattr(spark, "_esp_density_memo"):
        del spark._esp_density_memo
    dsp.lsh_candidate_density = stale_then_real
    try:
        # cap = 10 x 3 = 30 rows << the real corpus -> dense raises
        got = {
            (r.id_a, r.id_b): r.cosine_sim
            for r in dsp.cosine_pairs_auto(
                emb, 0.4, dense_block=10, max_dense_blocks=3
            ).collect()
        }
        assert calls["n"] == 2  # stale probe + one eviction re-probe
    finally:
        dsp.lsh_candidate_density = real
    base = {(r.id_a, r.id_b): r.cosine_sim for r in cosine_pairs(emb, 0.4).collect()}
    assert got == base and len(base) > 0


def test_int8_quantization_roundtrip_bounds(spark):
    """Symmetric int8 quantization: codes stay in [-127, 127], max
    reconstruction error is bounded by scale/2 (round-to-nearest), the
    all-zero vector yields NULL scale/derived columns, and the profile
    matches a numpy reference."""
    import numpy as np

    from etl_school_spark.functions.vectors import (
        as_double,
        int8_scale,
        quant_profile,
        quantize_int8,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    vecs = [rng.normal(0, 1, 16).astype("float32").tolist() for _ in range(20)]
    rows = [(i, v) for i, v in enumerate(vecs)] + [(99, [0.0] * 16)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v = as_double(F.col("embedding"))
    s = int8_scale(v)
    out = df.select(
        "vec_id",
        s.alias("scale"),
        quantize_int8(v, s).alias("codes"),
        quant_profile(v).alias("p"),
    ).collect()
    by_id = {r.vec_id: r for r in out}

    zero = by_id[99]
    assert zero.scale is None and zero.p.q_mse is None  # nothing to scale

    for i, vec in enumerate(vecs):
        r = by_id[i]
        arr = np.array(vec, dtype=np.float64)
        ref_scale = np.abs(arr).max() / 127.0
        assert abs(r.scale - ref_scale) < 1e-12
        assert all(-127 <= c <= 127 for c in r.codes)
        recon = np.array(r.codes, dtype=np.float64) * r.scale
        err = np.abs(arr - recon)
        assert err.max() <= r.scale / 2 + 1e-12
        assert abs(r.p.q_max_err - err.max()) < 1e-12
        assert abs(r.p.q_mse - (err ** 2).mean()) < 1e-12


def test_ivf_cell_block_invariant_and_no_broadcast_handles(spark):
    """r9: the ivf cell scorer shares knn's block-tiled shortlist
    (gemm.blocked_shortlist_scores) — shrinking cell_block far below the
    cell size must not change a single row/bit. And ivf frames carry NO
    broadcast handles (centroids are plan literals, ivf_topk docstring),
    so destroy_broadcasts is a documented 0-return no-op there."""
    from etl_school_spark.similarity.gemm import destroy_broadcasts
    from etl_school_spark.similarity.ivf import ivf_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)

    def rows(block):
        return sorted(
            map(
                tuple,
                ivf_topk(
                    emb, queries, k=5, n_cells=16, nprobe=6, cell_block=block
                ).collect(),
            )
        )

    # ~2000/16 = ~125-member cells; block=16 forces ~8 block passes
    assert rows(16) == rows(10**9) != []
    out = ivf_topk(emb, queries, k=3)
    assert destroy_broadcasts(out) == 0  # no handles to free, by design


def test_destroy_broadcasts_does_not_survive_derived_frames(spark):
    """r9 (ADVICE): _esp_broadcasts lives on the exact returned object;
    a derived frame silently reports 0 destroyed while its closures
    still hold the blocks — the docstring caveat, pinned so the
    behavior can't drift silently."""
    from etl_school_spark.similarity.gemm import destroy_broadcasts, gemm_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    out = gemm_topk(emb, queries, k=3)
    derived = out.filter(F.col("rank") == 1)
    assert destroy_broadcasts(derived) == 0  # hook did not propagate
    assert len(derived.collect()) > 0  # blocks still live
    assert destroy_broadcasts(out) == 1  # the original frees them


def test_ivf_verify_backends_bit_identical(spark):
    """The cogroup-gemm verify (default) and the declarative cell-join
    verify must produce IDENTICAL rows — same neighbors, same ranks,
    same score BITS (both emit exact sequential-fold doubles over the
    same candidate set) — so either backend satisfies the one oracle."""
    from etl_school_spark.similarity.ivf import ivf_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    a = {(r.query_id, r.rank): (r.neighbor_id, r.score)
         for r in ivf_topk(emb, queries, k=5, n_cells=16, nprobe=6, verify="gemm").collect()}
    b = {(r.query_id, r.rank): (r.neighbor_id, r.score)
         for r in ivf_topk(emb, queries, k=5, n_cells=16, nprobe=6, verify="sql").collect()}
    assert a == b and len(a) > 0


def test_destroy_broadcasts_releases_blocks_on_request(spark):
    """r8 broadcast lifecycle hook (gemm.py module docstring): a session
    done with a gemm result frame can reclaim its broadcast blocks
    immediately instead of waiting for the ContextCleaner. The hook must
    (a) destroy exactly the frame's registered broadcasts, (b) be
    idempotent, (c) leave the frame genuinely dead — re-execution after
    destroy must raise, which doubles as proof the blocks really were
    the frame's working state and are gone."""
    import pytest as _pytest

    from etl_school_spark.similarity.gemm import destroy_broadcasts, gemm_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    out = gemm_topk(emb, queries, k=3)
    assert len(out.collect()) > 0  # frame runs while the blocks live

    handles = list(out._esp_broadcasts)
    assert destroy_broadcasts(out) == len(handles) == 1
    assert destroy_broadcasts(out) == 0  # idempotent
    # frames with no registered broadcasts are a no-op, not an error
    assert destroy_broadcasts(emb) == 0
    with _pytest.raises(Exception):
        out.collect()  # destroyed blocks cannot be re-fetched


# ---------------------------------------------------------------------------
# SemDeDup (similarity/semantic.py): cluster-then-dedup differential vs
# an independent pure-Python reference with the same sequential fold
# order — pins assignment (first-min cell), within-cell pair detection
# at the threshold boundary, capped-components labeling, and BOTH keep
# rules. Training (train_centroids) is pinned separately by the
# ann_topk_ivf driver oracle, so the reference consumes the trained
# centroids as given.
# ---------------------------------------------------------------------------
def _py_semantic_dedup(rows, centroids, threshold, keep, far_rank="sq_l2"):
    import math

    def sqd(v, c):
        acc = 0.0
        for x, y in zip(v, c):
            acc += (x - y) * (x - y)
        return acc

    def dotf(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def norm(v):
        acc = 0.0
        for x in v:
            acc += x * x
        return math.sqrt(acc)

    cell, nrm = {}, {}
    vec = dict(rows)
    for vid, v in rows:
        ds = [sqd(v, c) for c in centroids]
        cell[vid] = ds.index(min(ds))  # first min = array_position
        nrm[vid] = norm(v)
    ids = sorted(vec)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if cell[a] != cell[b]:
                continue
            if dotf(vec[a], vec[b]) / (nrm[a] * nrm[b]) >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {i: find(i) for i in ids}
    out = {}
    if keep == "min_id":
        for i in ids:
            out[i] = (cell[i], comp[i], comp[i] == i)
    else:  # least-prototypical member survives, id tiebreak
        best = {}
        for i in ids:
            if far_rank == "cosine":
                # literal paper rule: LOWEST cos(v, own centroid) wins;
                # replicates _cell_cos_arrow's exact arithmetic
                # (seq-fold dot / (JVM norm × seq-fold centroid norm))
                cen = centroids[cell[i]]
                d = dotf(vec[i], cen) / (nrm[i] * norm(cen))
                better = lambda new, old: (new[0], new[1]) < (old[0], old[1])  # noqa: E731
            else:
                d = sqd(vec[i], centroids[cell[i]])
                better = lambda new, old: (new[0], -new[1]) > (old[0], -old[1])  # noqa: E731
            c = comp[i]
            if c not in best or better((d, i), best[c]):
                best[c] = (d, i)
        for i in ids:
            out[i] = (cell[i], comp[i], best[comp[i]][1] == i)
    return out


@pytest.mark.parametrize("threshold,keep", [
    (0.95, "min_id"), (0.8, "min_id"), (0.95, "farthest"), (0.8, "farthest"),
])
def test_semantic_dedup_matches_python(spark, threshold, keep):
    from etl_school_spark.similarity.ivf import train_centroids
    from etl_school_spark.similarity.semantic import semantic_dedup

    emb = _emb(spark).filter(F.col("vec_id") < 150)
    got = {
        r.vec_id: (r.cell, r.component, r.keep)
        for r in semantic_dedup(
            emb, threshold=threshold, n_cells=4, keep=keep
        ).collect()
    }
    rows = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.select("vec_id", "embedding").collect()
    ]
    centroids = train_centroids(emb, n_cells=4)
    want = _py_semantic_dedup(rows, centroids, threshold, keep)
    assert got == want


@pytest.mark.parametrize("far_rank", ["sq_l2", "cosine"])
def test_semantic_far_rank_unnormalized_matches_python(spark, far_rank):
    """r11 (VERDICT item 5): both farthest rankings must match the
    Python twin on UNNORMALIZED geometries — per-vector magnitudes
    scaled so that the sq_l2 proxy and the literal lowest-cosine paper
    rule provably pick DIFFERENT survivors somewhere (asserted below:
    a differential that cannot disagree pins nothing)."""
    from etl_school_spark.similarity.ivf import train_centroids
    from etl_school_spark.similarity.semantic import semantic_dedup

    import math

    # planted disagreement geometry (unnormalized): region A is a unit
    # cluster near e1 (background + the first k-means seed); region B
    # is one duplicate component {p1, p3 at e2 norm 1; p2 at norm 3,
    # 20° off} — pairwise cos(p1,p2)=cos20°≈0.94 ≥ 0.8 (edges), while
    # against the trained B centroid (≈ the component mean, pulled
    # toward p2 by its magnitude: angle ≈12°) p2 is FARTHEST by
    # squared-L2 (1.94 vs 0.49) but has the HIGHEST cosine (cos 8° vs
    # cos 12°), so sq_l2 keeps p2 and the paper rule keeps p1. (Norm 3,
    # not larger: the centroid must stay close enough to e2 that p1
    # still assigns to the B cell, or the component would split.)
    th = math.radians(20.0)
    data = [(0, [1.0, 0.0, 0.0, 0.0])]
    data += [(10 + i, [1.0, 0.01 * i, 0.0, 0.0]) for i in range(8)]
    data += [
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 3 * math.cos(th), 3 * math.sin(th), 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in data],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: (r.cell, r.component, r.keep)
        for r in semantic_dedup(
            emb, threshold=0.8, n_cells=2, keep="farthest", far_rank=far_rank
        ).collect()
    }
    rows = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.select("vec_id", "embedding").collect()
    ]
    centroids = train_centroids(emb, n_cells=2)
    want = _py_semantic_dedup(rows, centroids, 0.8, "farthest", far_rank)
    assert got == want
    # the two rules must genuinely disagree on this geometry
    other = _py_semantic_dedup(
        rows, centroids, 0.8, "farthest",
        "cosine" if far_rank == "sq_l2" else "sq_l2",
    )
    assert want != other, "geometry failed to separate the rankings"


def test_semantic_dedup_rejects_bad_far_rank(spark):
    from etl_school_spark.similarity.semantic import semantic_dedup

    with pytest.raises(ValueError, match="far_rank"):
        semantic_dedup(_emb(spark), far_rank="euclid")


def test_semantic_dedup_planted_duplicates(spark):
    """Planted exact copies form one component whose min id survives
    under min_id; under farthest, exactly one member survives and
    every component keeps exactly one."""
    from etl_school_spark.similarity.semantic import semantic_dedup

    base = _emb(spark).filter(F.col("vec_id") < 40).select("vec_id", "embedding")
    copies = base.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    emb = base.unionByName(copies)
    out = semantic_dedup(emb, threshold=0.999999, n_cells=4).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(out) == 45
    for i in range(5):  # each copy pairs with its source; min id wins
        assert by_id[i + 1000].component == by_id[i].component == i
        assert by_id[i].keep and not by_id[i + 1000].keep
    far = semantic_dedup(emb, threshold=0.999999, n_cells=4, keep="farthest")
    kept_per_comp = {}
    for r in far.collect():
        kept_per_comp.setdefault(r.component, 0)
        kept_per_comp[r.component] += int(r.keep)
    assert all(v == 1 for v in kept_per_comp.values())


def test_semantic_dedup_rejects_bad_keep(spark):
    from etl_school_spark.similarity.semantic import semantic_dedup

    with pytest.raises(ValueError):
        semantic_dedup(_emb(spark), keep="best")


def test_semantic_dedup_both_matches_single_rule_runs(spark):
    """r10: keep="both" (one pipeline pass, two flags — the
    embedding_suite physical form) is bit-identical to the two
    single-rule runs on every column."""
    from etl_school_spark.similarity.semantic import semantic_dedup

    emb = _emb(spark).filter(F.col("vec_id") < 120)
    both = {
        r.vec_id: (r.cell, r.component, r.keep_min, r.keep_far)
        for r in semantic_dedup(
            emb, threshold=0.8, n_cells=4, keep="both"
        ).collect()
    }
    mins = {
        r.vec_id: (r.cell, r.component, r.keep)
        for r in semantic_dedup(
            emb, threshold=0.8, n_cells=4, keep="min_id"
        ).collect()
    }
    fars = {
        r.vec_id: (r.cell, r.component, r.keep)
        for r in semantic_dedup(
            emb, threshold=0.8, n_cells=4, keep="farthest"
        ).collect()
    }
    assert set(both) == set(mins) == set(fars)
    for vid, (cell, comp, kmin, kfar) in both.items():
        assert mins[vid] == (cell, comp, kmin)
        assert fars[vid] == (cell, comp, kfar)


def test_nearest_cell_arrow_matches_hof(spark):
    """r10: the vectorized Arrow assignment (_nearest_cell_arrow) must
    assign every vector to EXACTLY the cell the interpreted HOF form
    picks — same squared-distance fold order, same first-min tie rule —
    on the real embeddings and on planted exact-tie geometries."""
    from etl_school_spark.similarity.ivf import (
        _nearest_cell,
        _nearest_cell_arrow,
        train_centroids,
    )

    emb = _emb(spark)
    for n_cells in (4, 13):
        cents = train_centroids(emb, n_cells=n_cells)
        both = emb.select(
            "vec_id",
            _nearest_cell(F.col("embedding"), cents).alias("hof"),
            _nearest_cell_arrow(cents)(F.col("embedding")).alias("arrow"),
        ).collect()
        assert len(both) > 0
        mism = [(r.vec_id, r.hof, r.arrow) for r in both if r.hof != r.arrow]
        assert mism == [], mism[:5]

    # exact ties: two identical centroids → first index must win in both
    tie_cents = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    rows = df.select(
        "vec_id",
        _nearest_cell(F.col("embedding"), tie_cents).alias("hof"),
        _nearest_cell_arrow(tie_cents)(F.col("embedding")).alias("arrow"),
    ).collect()
    for r in rows:
        assert r.hof == r.arrow
    assert {r.vec_id: r.arrow for r in rows}[1] == 0  # first of the tied pair
    assert {r.vec_id: r.arrow for r in rows}[3] in (0, 1, 2)


def test_assign_cells_shortlist_bit_identical():
    """r11: _assign_cells (BLAS shortlist + exact-fold decide) must
    equal np.argmin(_sq_dists_matrix(V, C), axis=1) — the exact-fold
    rule with the first-minimum tie break — on tie-dense geometries:
    integer grids (exact midpoint ties abound), duplicate centroids,
    planted midpoints, sub-ulp centroid perturbations (approx distances
    collide, the fold must decide), and large-n_cells random corpora
    (the shortlist path the ⌈√n⌉ sizing grows into)."""
    import numpy as np

    from etl_school_spark.similarity.ivf import _assign_cells, _sq_dists_matrix

    rng = np.random.default_rng(17)

    def check(V, C):
        V = np.asarray(V, dtype=np.float64)
        C = np.asarray(C, dtype=np.float64)
        want = np.argmin(_sq_dists_matrix(V, C), axis=1)
        got = _assign_cells(V, C)
        assert (got == want).all(), (
            np.nonzero(got != want)[0][:5],
            got[got != want][:5],
            want[got != want][:5],
        )

    # integer grid: many exact ties, first index must win
    for dim in (2, 5):
        V = rng.integers(-3, 4, size=(400, dim)).astype(np.float64)
        C = rng.integers(-3, 4, size=(25, dim)).astype(np.float64)
        check(V, C)

    # duplicate centroids + planted exact midpoints
    c0 = rng.normal(size=8)
    c1 = rng.normal(size=8)
    C = np.stack([c0, c1, c0.copy(), (c0 + c1) / 2])
    mid = (c0 + c1) / 2
    V = np.stack([c0, c1, mid, mid + 1e-18, rng.normal(size=8)])
    check(V, C)

    # sub-ulp perturbed centroids: approx distances collide within the
    # margin; the exact fold decides (and ties break by first index)
    base = rng.normal(size=(1, 16))
    C = np.repeat(base, 6, axis=0)
    C[2] += 1e-16
    C[4] -= 1e-16
    V = rng.normal(size=(200, 16))
    check(V, C)

    # large-n_cells random: the regime the auto sizing grows into
    V = rng.normal(size=(500, 64)).astype(np.float32).astype(np.float64)
    C = rng.normal(size=(300, 64)).astype(np.float32).astype(np.float64)
    check(V, C)

    # float32-ranged magnitudes far from 1 (the margin's ‖v‖²+‖c‖²
    # scaling must track the data's scale, not assume unit norms)
    check(V * 1e4, C * 1e4)
    check(V * 1e-4, C * 1e-4)

    # CROSS-TILE ties: duplicate centroids in different BLAS tiles
    # (chunk = 256) — candidates survive each tile's own cut and the
    # post-pass first-index rule must still pick the lower cell id
    C2 = rng.normal(size=(400, 8))
    C2[300] = C2[3]  # exact duplicate across the tile boundary
    C2[310] = C2[3]
    V2 = np.concatenate([C2[3][None, :].repeat(5, axis=0), rng.normal(size=(50, 8))])
    V2 = np.asarray(V2, dtype=np.float64)
    got = _assign_cells(V2, np.asarray(C2, dtype=np.float64))
    assert (got[:5] == 3).all()
    check(V2, C2)


def test_probe_cells_arrow_matches_rank_rule(spark):
    """r11: _probe_cells_arrow must select EXACTLY the first-nprobe
    cells by (exact fold distance, cell) — the posexplode + Window
    row_number rule it replaces — on real embeddings and on
    duplicate-centroid tie geometries, and emit them in that order.
    NULL query vectors get NULL probe arrays (explode drops them,
    matching posexplode-of-NULL)."""
    import numpy as np

    from etl_school_spark.similarity.ivf import (
        _probe_cells_arrow,
        _sq_dists_matrix,
        train_centroids,
    )

    emb = _emb(spark)
    for n_cells, nprobe in ((13, 4), (5, 5), (4, 9)):
        cents = train_centroids(emb, n_cells=n_cells)
        sub = emb.filter(F.col("vec_id") % 7 == 0)
        got = {
            r.vec_id: list(r.p)
            for r in sub.select(
                "vec_id",
                _probe_cells_arrow(cents, nprobe)(F.col("embedding")).alias("p"),
            ).collect()
        }
        C = np.array(cents, dtype=np.float64)
        for r in sub.select("vec_id", "embedding").collect():
            V = np.array([[float(x) for x in r.embedding]])
            d = _sq_dists_matrix(V, C)[0]
            order = np.lexsort((np.arange(len(cents)), d))
            want = [int(c) for c in order[: min(nprobe, len(cents))]]
            assert got[r.vec_id] == want, (r.vec_id, got[r.vec_id], want)

    # duplicate centroids across tile-boundary-free small case: exact
    # ties must resolve by cell id, and the probe array holds EXACTLY
    # nprobe entries even when every distance ties
    tie = [[1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5]), (3, None)],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r.vec_id: r.p
        for r in df.select(
            "vec_id", _probe_cells_arrow(tie, 2)(F.col("embedding")).alias("p")
        ).collect()
    }
    assert rows[1] == [0, 1]  # tied duplicates, first ids win
    assert rows[3] is None


def test_arrow_kernels_tolerate_null_vectors(spark):
    """r10 review: the Arrow kernels must preserve the HOF forms' NULL
    contract — a NULL embedding gets a NULL cell/distance (and
    contributes nothing to training sums, like posexplode of NULL) —
    instead of crashing the task on an inhomogeneous np.array."""
    from etl_school_spark.similarity.ivf import (
        _all_dists_arrow,
        _cell_dist_arrow,
        _nearest_cell_arrow,
        train_centroids,
    )

    base = _emb(spark).filter(F.col("vec_id") < 30).select("vec_id", "embedding")
    with_null = base.unionByName(
        spark.createDataFrame(
            [(999, None)], "vec_id long, embedding array<float>"
        )
    )
    cents = train_centroids(base, n_cells=4)
    # training ignores the NULL row entirely
    assert train_centroids(with_null, n_cells=4) == cents

    got = with_null.select(
        "vec_id",
        _nearest_cell_arrow(cents)(F.col("embedding")).alias("cell"),
        _all_dists_arrow(cents)(F.col("embedding")).alias("ds"),
    ).collect()
    by_id = {r.vec_id: r for r in got}
    assert by_id[999].cell is None and by_id[999].ds is None
    assert all(r.cell is not None for r in got if r.vec_id != 999)

    d = with_null.select(
        "vec_id",
        _cell_dist_arrow(cents)(
            F.col("embedding").cast("array<double>"),
            _nearest_cell_arrow(cents)(F.col("embedding")),
        ).alias("d"),
    ).collect()
    dd = {r.vec_id: r.d for r in d}
    assert dd[999] is None
    assert all(v is not None for k, v in dd.items() if k != 999)


def test_semantic_pair_form_gemm_matches_sql(spark):
    """r10: the BLAS within-cell pair stage (pair_form="gemm",
    gemm.blocked_pair_edges — shortlist at threshold − margin, exact
    sequential-fold decide) must produce a row-identical result to the
    declarative HOF-fold join at every threshold and block size,
    including single-row blocks that force maximal tiling.

    r11: the corpus carries TWO NULL-embedding rows — they share the
    NULL cell group, so the gemm branch's kernel sees a group with
    multiple None vectors (the r10 default-crash regression the r11
    fix in blocked_pair_edges covers: NULL vectors can never form an
    edge, matching the sql form's NULL-join-key semantics)."""
    from etl_school_spark.similarity.semantic import semantic_dedup

    emb = _emb(spark).filter(F.col("vec_id") < 150).select("vec_id", "embedding")
    null_rows = emb.limit(2).select(
        (F.col("vec_id") + 900).alias("vec_id"),
        F.lit(None).cast(emb.schema["embedding"].dataType).alias("embedding"),
    )
    emb = emb.unionByName(null_rows)

    def rows(**kw):
        return {
            r.vec_id: (r.cell, r.component, r.keep_min, r.keep_far)
            for r in semantic_dedup(emb, n_cells=4, keep="both", **kw).collect()
        }

    for threshold in (0.4, 0.95):
        base = rows(threshold=threshold, pair_form="sql")
        for block in (3, 4096):
            got = rows(threshold=threshold, pair_form="gemm", cell_block=block)
            assert got == base, f"t={threshold} block={block}"


def test_lsh_density_probe_tolerates_null_vectors(spark):
    """r11 (ADVICE): the driver-side density probe must skip NULL
    embeddings in the collected sample (the Spark-side probe it
    replaced tolerated them — NULL pool codes never join), excluding
    them from the sampled-row count, so the density VALUE over the
    non-NULL rows is unchanged and dispatch never hard-fails on one
    NULL vector."""
    from etl_school_spark.similarity.knn import lsh_candidate_density

    emb = _emb(spark).filter(F.col("vec_id") < 100).select("vec_id", "embedding")
    nulls = emb.limit(2).select(
        (F.col("vec_id") + 900).alias("vec_id"),
        F.lit(None).cast(emb.schema["embedding"].dataType).alias("embedding"),
    )
    n0, d0 = lsh_candidate_density(emb)
    n1, d1 = lsh_candidate_density(emb.unionByName(nulls))
    # n counts the full corpus (stride sizing); with <= sample_rows rows
    # both probes collect everything, so the densities match exactly
    assert (n0, n1) == (100, 102)
    assert d1 == d0


def test_semantic_dedup_rejects_bad_pair_form(spark):
    from etl_school_spark.similarity.semantic import semantic_dedup

    with pytest.raises(ValueError, match="pair_form"):
        semantic_dedup(_emb(spark), pair_form="blas")


def test_semantic_pair_form_auto_dispatch(spark):
    """r10: pair_form="auto" (the default) picks gemm when its
    contracts hold (integer ids, expected cell ≤ gemm_cell_bound) and
    sql otherwise; the decision helper is unit-tested directly (the
    pair stage executes eagerly inside connected_components, so the
    choice is invisible in the output plan) and the full default-params
    run completes under each decision. Edge-set identity across forms
    is pinned by the explicit-form differential tests."""
    from etl_school_spark.similarity.semantic import (
        _resolve_pair_form,
        semantic_dedup,
    )

    emb = _emb(spark).filter(F.col("vec_id") < 60)
    form, n = _resolve_pair_form(emb, "vec_id", 4, 65_536, None)
    assert form == "gemm" and n == 60
    # tiny bound → expected cell exceeds it → sql (count reused)
    assert _resolve_pair_form(emb, "vec_id", 4, 2, 60) == ("sql", 60)
    # string ids → sql, and NO count job is spent on the decision
    s = emb.select(
        F.concat(F.lit("d-"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    assert _resolve_pair_form(s, "vec_id", 4, 65_536, None) == ("sql", None)
    # full default-params runs land on each branch without error
    assert semantic_dedup(emb, threshold=0.999999).count() == 60
    assert semantic_dedup(s, threshold=0.999999).count() == 60


def test_semantic_gemm_rejects_string_ids_loudly(spark):
    """r10: the gemm pair form's long/long edge schema cannot carry
    string ids — the guard must fail at plan time with a pointer to the
    sql form, not as an opaque numpy cast error inside the worker. The
    sql form itself handles string ids fine."""
    from etl_school_spark.similarity.semantic import semantic_dedup

    emb = (
        _emb(spark)
        .filter(F.col("vec_id") < 40)
        .select(F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"), "embedding")
    )
    with pytest.raises(ValueError, match="pair_form='sql'"):
        semantic_dedup(emb, n_cells=4, pair_form="gemm")
    out = semantic_dedup(emb, threshold=0.999999, n_cells=4, pair_form="sql")
    rows = out.collect()
    assert len(rows) == 40 and all(isinstance(r.vec_id, str) for r in rows)


def test_auto_cells_is_ceil_sqrt():
    """r10: the n_cells="auto" derivation is exactly ⌈√n⌉ (integer math,
    no float edge at perfect squares), clamped ≥ 1."""
    from etl_school_spark.similarity.semantic import _auto_cells

    assert _auto_cells(0) == 1
    assert _auto_cells(1) == 1
    assert _auto_cells(2) == 2
    assert _auto_cells(4) == 2
    assert _auto_cells(5) == 3
    assert _auto_cells(16) == 4
    assert _auto_cells(17) == 5
    assert _auto_cells(10_000) == 100
    assert _auto_cells(10_001) == 101
    assert _auto_cells(20_000) == 142  # the census's "20k vectors want ~141"


def test_semantic_dedup_auto_cells_matches_explicit(spark):
    """r10: semantic_dedup's default n_cells="auto" must be row-identical
    to passing the ⌈√n⌉ count explicitly — auto changes the PARAMETER
    derivation, never the computation."""
    from etl_school_spark.similarity.semantic import _auto_cells, semantic_dedup

    emb = _emb(spark).filter(F.col("vec_id") < 150)
    n = emb.count()
    want_cells = _auto_cells(n)
    assert want_cells == 13  # 150 vectors → ⌈√150⌉
    auto = {
        r.vec_id: (r.cell, r.component, r.keep)
        for r in semantic_dedup(emb, threshold=0.8).collect()
    }
    explicit = {
        r.vec_id: (r.cell, r.component, r.keep)
        for r in semantic_dedup(emb, threshold=0.8, n_cells=want_cells).collect()
    }
    assert auto == explicit
    assert {c for c, _, _ in auto.values()} <= set(range(want_cells))


def test_cosine_pairs_auto_does_not_swallow_unrelated_valueerror(spark):
    """r10 ADVICE: the stale-memo eviction catches only DenseCapExceeded.
    Any OTHER ValueError raised inside the dense branch must propagate
    unmasked — no silent reroute to the bucketed plan, no extra probe."""
    from etl_school_spark.similarity import dispatch as dsp

    emb = _emb(spark)
    calls = {"n": 0}
    real_probe = dsp.lsh_candidate_density
    real_dense = dsp.cosine_pairs_dense

    def dense_probe(*a, **kw):
        calls["n"] += 1
        return (20, 1.0)  # routes to the dense branch

    def broken_dense(*a, **kw):
        raise ValueError("unrelated failure inside the dense branch")

    if hasattr(spark, "_esp_density_memo"):
        del spark._esp_density_memo
    dsp.lsh_candidate_density = dense_probe
    dsp.cosine_pairs_dense = broken_dense
    try:
        with pytest.raises(ValueError, match="unrelated failure"):
            dsp.cosine_pairs_auto(emb, 0.4)
        assert calls["n"] == 1  # no eviction re-probe for a foreign error
    finally:
        dsp.lsh_candidate_density = real_probe
        dsp.cosine_pairs_dense = real_dense


def test_train_centroids_clamps_to_corpus_size(spark):
    """A corpus smaller than n_cells trains one centroid per row instead
    of indexing past the seed list; semantic_dedup over it still labels
    every vector."""
    from etl_school_spark.similarity.ivf import train_centroids
    from etl_school_spark.similarity.semantic import semantic_dedup

    emb = _emb(spark).filter(F.col("vec_id") < 3)
    cents = train_centroids(emb, n_cells=16)
    assert len(cents) == 3
    out = semantic_dedup(emb, threshold=0.95, n_cells=16).collect()
    assert len(out) == 3 and all(r.keep is not None for r in out)
