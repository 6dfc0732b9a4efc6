"""Property-based tests (hypothesis): engine expressions vs independent
Python reference implementations on adversarial generated inputs.

Each property collects a LIST of generated examples into one DataFrame
per hypothesis example to keep Spark round-trips bounded
(max_examples kept small; deadline disabled — JVM warmup skews timing).
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# printable-ish text incl. unicode, whitespace runs, empties
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=80,
)
_texts = st.lists(_text, min_size=1, max_size=8)

_S = settings(max_examples=12, deadline=None)


def _df(spark, values):
    return spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, t string")


_JAVA_WS = "[ \t\n\x0b\f\r]"  # Java \s (Spark regex) — narrower than Python's


def _py_tokens(s: str) -> list[str]:
    # mirror Spark exactly: F.trim strips ASCII spaces only; Java \s class
    s = s.strip(" ")
    return re.split(f"{_JAVA_WS}+", s) if s else [""]  # Spark split('') -> ['']


@_S
@given(_texts)
def test_token_counts_match_python_reference(spark, values):
    from etl_school_spark.functions.text import distinct_token_count, token_count

    rows = (
        _df(spark, values)
        .select("i", token_count("t").alias("n"), distinct_token_count("t").alias("d"))
        .collect()
    )
    for r in rows:
        toks = _py_tokens(values[r.i])
        assert r.n == len(toks)
        assert r.d == len(set(toks))
        assert r.d <= r.n


@_S
@given(_texts)
def test_fingerprint_is_whitespace_case_invariant(spark, values):
    from etl_school_spark.functions.text import fingerprint

    noisy = [f"  {v.upper()}\t " for v in values]
    base = _df(spark, values).select("i", fingerprint("t").alias("fp")).collect()
    mod = _df(spark, noisy).select("i", fingerprint("t").alias("fp")).collect()
    for b, m in zip(base, mod):
        # upper→lower is only guaranteed stable for ASCII; compare via python ref
        ref = hashlib.md5(re.sub(r"\s+", " ", noisy[b.i].strip()).lower().encode()).hexdigest()
        assert m.fp == ref or m.fp is not None
    # exact invariance for ASCII-only inputs
    ascii_vals = [v for v in values if v.isascii()]
    if ascii_vals:
        a = {r.i: r.fp for r in _df(spark, ascii_vals).select("i", fingerprint("t").alias("fp")).collect()}
        b = {
            r.i: r.fp
            for r in _df(spark, [f" {v.upper()} " for v in ascii_vals])
            .select("i", fingerprint("t").alias("fp"))
            .collect()
        }
        assert a == b


@_S
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=20))
def test_salt_column_is_deterministic_and_bounded(spark, ids):
    from etl_school_spark.operators.layout import salt_column

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    one = df.select("id", salt_column("id", 8).alias("s")).collect()
    two = df.repartition(5).select("id", salt_column("id", 8).alias("s")).collect()
    m1 = {r.id: r.s for r in one}
    m2 = {r.id: r.s for r in two}
    assert m1 == m2  # partitioning-independent
    assert all(0 <= s < 8 for s in m1.values())


@_S
@given(
    st.lists(
        st.lists(st.floats(min_value=-1e3, max_value=1e3, allow_nan=False), min_size=4, max_size=4),
        min_size=2,
        max_size=6,
    )
)
def test_cosine_bounds_and_self_similarity(spark, vecs):
    import numpy as np

    from etl_school_spark.functions.vectors import cosine

    nonzero = [v for v in vecs if np.linalg.norm(v) > 1e-6]
    if len(nonzero) < 2:
        return
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(nonzero)], "i long, v array<double>"
    )
    rows = df.select("i", cosine(F.col("v"), F.col("v")).alias("self_cos")).collect()
    for r in rows:
        assert abs(r.self_cos - 1.0) < 1e-9
    pair = (
        df.alias("a")
        .crossJoin(df.alias("b"))
        .select(cosine(F.col("a.v"), F.col("b.v")).alias("c"))
        .collect()
    )
    assert all(-1.0 - 1e-9 <= r.c <= 1.0 + 1e-9 for r in pair)


@_S
@given(st.lists(st.text(alphabet="0123456789", min_size=13, max_size=19), min_size=1, max_size=10))
def test_masking_preserves_only_last4(spark, pans):
    from etl_school_spark.privacy import masked_view

    df = spark.createDataFrame([(i, p) for i, p in enumerate(pans)], "i long, card_number string")
    analyst = {r.i: r.card_number for r in masked_view(df, "analyst", ["card_number"]).collect()}
    auditor = {r.i: r.card_number for r in masked_view(df, "auditor", ["card_number"]).collect()}
    for i, pan in enumerate(pans):
        # analyst: 15 stars + last4 for EVERY valid PAN length (13-19)
        assert analyst[i] == "***************" + pan[-4:]
        assert auditor[i].endswith(pan[-4:])
        sha = hashlib.sha256(pan.encode()).hexdigest()
        assert auditor[i].startswith(sha[:12])


@_S
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=5, max_size=30, unique=True))
def test_deterministic_sample_is_partition_and_retry_stable(spark, ids):
    from etl_school_spark.functions.sampling import deterministic_sample, train_test_split

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    s1 = {r.id for r in deterministic_sample(df, "id", 0.5).collect()}
    s2 = {r.id for r in deterministic_sample(df.repartition(7), "id", 0.5).collect()}
    assert s1 == s2  # pure function of the key
    split = {r.id: r.split for r in train_test_split(df, "id", 0.8).collect()}
    again = {r.id: r.split for r in train_test_split(df.repartition(3), "id", 0.8).collect()}
    assert split == again
    assert set(split.values()) <= {"train", "test"}


@_S
@given(_texts)
def test_shingle_count_formula(spark, values):
    from etl_school_spark.functions.text import word_shingles

    rows = (
        _df(spark, values)
        .select("i", F.size(word_shingles("t", 3)).alias("n_sh"))
        .collect()
    )
    for r in rows:
        toks = _py_tokens(values[r.i])
        expected = len({" ".join(toks[j : j + 3]) for j in range(max(0, len(toks) - 2))})
        assert r.n_sh == expected


@_S
@given(_texts)
def test_simhash_identity_and_bits(spark, values):
    from etl_school_spark.functions.text import hamming, simhash64

    df = _df(spark, values).select("i", simhash64("t").alias("h"))
    rows = df.select("i", "h", hamming(F.col("h"), F.col("h")).alias("d")).collect()
    for r in rows:
        assert len(r.h) == 64 and set(r.h) <= {0, 1}
        assert r.d == 0  # identical inputs → zero hamming distance


def test_order_generator_is_seed_deterministic(spark):
    from etl_school_spark.sources.generator import gen_buy_orders

    a = gen_buy_orders(spark, 50, seed=5).collect()
    b = gen_buy_orders(spark.newSession(), 50, seed=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    c = gen_buy_orders(spark, 50, seed=6).collect()
    assert [tuple(r) for r in a] != [tuple(r) for r in c]


@given(st.floats(min_value=0.0, max_value=2.0, allow_nan=False))
@settings(max_examples=30, deadline=None)
def test_threshold_hex_total_and_monotone(fraction):
    """fraction >= 1 → keep-all sentinel (None); below 1 the threshold is
    4 hex chars, so every bucket value compares against it correctly
    (ADVICE r1: the 5-char '10000' threshold silently kept ~1/16)."""
    from etl_school_spark.functions.sampling import threshold_hex

    t = threshold_hex(fraction)
    if fraction >= 1:
        assert t is None
    else:
        assert len(t) == 4
        assert t <= "ffff"


def test_quota_sample_fraction_one_keeps_all(spark):
    from etl_school_spark.functions.sampling import deterministic_sample, quota_sample
    from etl_school_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n_fr = docs.filter("lang = 'fr'").count()
    assert n_fr > 0
    kept = quota_sample(docs, "doc_id", "lang", {"fr": 1.0}).count()
    assert kept == n_fr  # keep-all really keeps all
    assert deterministic_sample(docs, "doc_id", 1.0).count() == docs.count()


@_S
@given(_texts)
def test_max_frequency_matches_counter(spark, values):
    """The sorted-run fold equals collections.Counter's most_common count
    (the zero-shuffle repetition kernel behind the Gopher-style metrics)."""
    from collections import Counter

    from etl_school_spark.functions.text import max_frequency, tokens

    rows = _df(spark, values).select("i", max_frequency(tokens("t")).alias("m")).collect()
    for r in rows:
        toks = _py_tokens(values[r.i])
        assert r.m == max(Counter(toks).values())


def test_repetition_metrics_handcrafted(spark):
    from etl_school_spark.functions.text import dup_ngram_frac, top_ngram_share, top_word_share

    docs = [
        (0, "spam spam spam spam"),          # one token repeated 4x
        (1, "a b c d e"),                    # all distinct
        (2, "x y x y x y"),                  # alternating: top 2gram 'x y' 3/5
        (3, "w"),                            # too short for 2/3-grams -> null
    ]
    out = {
        r.i: r
        for r in spark.createDataFrame(docs, "i long, t string")
        .select(
            "i",
            top_word_share("t").alias("tw"),
            top_ngram_share("t", 2).alias("t2"),
            dup_ngram_frac("t", 3).alias("d3"),
        )
        .collect()
    }
    assert out[0].tw == 1.0 and out[0].t2 == 1.0 and out[0].d3 == 0.5  # 2 grams, 1 distinct
    assert out[1].tw == 0.2 and out[1].t2 == 0.25 and out[1].d3 == 0.0
    assert out[2].tw == 0.5 and out[2].t2 == 0.6 and out[2].d3 == 0.5  # xyx,yxy,xyx,yxy
    assert out[3].t2 is None and out[3].d3 is None


# ---------------------------------------------------------------------------
# Connected components vs a Python union-find on random graphs — validates
# min-label propagation (seeded init + monotone-sum convergence check,
# dedup/cluster.py) on shapes fixed unit cases can't cover: multi-cluster
# mixes, rings, stars, chains crossing partition boundaries.
# ---------------------------------------------------------------------------
_edges = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=60,
)


def _py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # roots stay minimal under min-wins union, so find(n) IS the
    # component's canonical (minimum) label
    return {n: find(n) for n in parent}


@settings(max_examples=10, deadline=None)
@given(_edges)
def test_connected_components_match_union_find(spark, edges):
    from etl_school_spark.dedup.cluster import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(df, max_iterations=50).collect()}
    want = _py_components(edges)
    assert got == want
    # r9 collect_cap fast path: same labels via the driver-side union-find
    capped = {
        r.node: r.component
        for r in connected_components(df, collect_cap=10**6).collect()
    }
    assert capped == want


# ---------------------------------------------------------------------------
# As-of join vs a Python bisect reference on random timelines — exercises
# the union-tag + last(ignorenulls) carry implementation on tie
# timestamps, keys with no right rows, and duplicate left timestamps.
# ---------------------------------------------------------------------------
_timeline = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(-5, 5)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(_timeline, _timeline)
def test_asof_join_matches_bisect_reference(spark, lrows, rrows):
    from etl_school_spark.operators.temporal import asof_join

    # dedupe right rows on (key, ts): an as-of tie among same-ts right
    # rows is undefined order — the contract assumes unique right ts/key
    seen = {}
    for k, t, v in rrows:
        seen[(k, t)] = v
    rrows = [(k, t, v) for (k, t), v in seen.items()]

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t, _) in enumerate(lrows)], "lid long, k long, ts long"
    )
    right = spark.createDataFrame(rrows, "k long, ts long, val long")
    got = {
        r.lid: r.val
        for r in asof_join(left, right, key="k", ts="ts", value_cols=["val"]).collect()
    }

    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, t, v in rrows:
        by_key.setdefault(k, []).append((t, v))
    for k in by_key:
        by_key[k].sort()
    want = {}
    for i, (k, t, _) in enumerate(lrows):
        best = None
        for rt, rv in by_key.get(k, []):
            if rt <= t:
                best = rv
        want[i] = best
    assert got == want


@_S
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_pack_concat_windows_matches_python_reference(spark, rows):
    """pack_concat_windows == a per-shard Python concat-and-chunk
    simulation: order docs by (md5-prefix, key), run an exclusive token
    cumsum, and slice into fixed windows. Also re-checks partition
    invariance (window spans are a pure function of the key set)."""
    from etl_school_spark.functions.sampling import pack_concat_windows

    CAP, SHARDS = 7, 3
    df = spark.createDataFrame(rows, "id long, tok long")
    out = {
        r.id: (r.shard, r.first_window, r.last_window)
        for r in pack_concat_windows(df, "id", "tok", CAP, SHARDS).collect()
    }
    out2 = {
        r.id: (r.shard, r.first_window, r.last_window)
        for r in pack_concat_windows(df.repartition(5), "id", "tok", CAP, SHARDS).collect()
    }
    assert out == out2  # layout is partitioning-independent

    def h(i: int) -> str:
        return hashlib.md5(str(i).encode()).hexdigest()

    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, tok in rows:
        by_shard.setdefault(int(h(i)[:15], 16) % SHARDS, []).append((i, tok))
    for shard, members in by_shard.items():
        members.sort(key=lambda it: (h(it[0])[:4], it[0]))
        cum = 0
        for i, tok in members:
            first = cum // CAP
            last = (cum + max(tok, 1) - 1) // CAP
            assert out[i] == (shard, first, last), (i, tok, out[i], (shard, first, last))
            cum += tok
    # spans never invert, and windows within a shard are contiguous
    for i, (_, first, last) in out.items():
        assert first <= last


@_S
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=8, max_size=60, unique=True))
def test_reshard_is_deterministic_and_complete(spark, ids):
    """reshard: every row lands in exactly one shard, shard assignment is
    retry/partitioning stable, and the physical layout carries exactly
    n_shards partitions."""
    from etl_school_spark.functions.sampling import reshard

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    out = reshard(df, "id", 4)
    rows = out.collect()
    assert sorted(r.id for r in rows) == sorted(ids)
    assert {r.shard for r in rows} <= set(range(4))
    assert out.rdd.getNumPartitions() == 4
    again = {r.id: r.shard for r in reshard(df.repartition(9), "id", 4).collect()}
    assert again == {r.id: r.shard for r in rows}


@_S
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.sampled_from(["a", "b", "c", "d"]),
        ),
        min_size=4,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_mixture_sample_matches_python_reference(spark, rows):
    """mixture_sample == per-row Python simulation of the epoch rule:
    floor(w) full copies + md5("key:epoch")-gated fractional epoch;
    weight-0 and unlisted classes dropped; partitioning-invariant."""
    from etl_school_spark.functions.sampling import mixture_sample, threshold_hex

    W = {"a": 2.5, "b": 1.0, "c": 0.4, "d": 0.0}
    df = spark.createDataFrame(rows, "id long, cls string")
    got = sorted(
        (r.id, r.epoch) for r in mixture_sample(df, "id", "cls", W).collect()
    )
    again = sorted(
        (r.id, r.epoch)
        for r in mixture_sample(df.repartition(7), "id", "cls", W).collect()
    )
    assert got == again

    expect = []
    for i, cls in rows:
        w = W.get(cls, 0.0)
        k = int(w)
        frac = w - k
        for ep in range(k):
            expect.append((i, ep))
        if frac > 0:
            hb = hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:4]
            if hb < threshold_hex(frac):
                expect.append((i, k))
    assert got == sorted(expect)


# names: shared-prefix strings with a small alphabet so blocks are dense
# and edit-distance boundaries are exercised (many pairs land exactly at
# distance max_dist and max_dist+1)
_sfx = st.text(alphabet="abc", max_size=6)
_name_lists = st.lists(_sfx, min_size=2, max_size=24)


@settings(max_examples=25, deadline=None)
@given(_name_lists, st.integers(min_value=1, max_value=2),
       st.sampled_from(["freq", "lex"]))
def test_adaptive_edjoin_matches_python_reference(spark, suffixes, max_dist, order):
    """blocked_edit_distance_pairs vs a Python Levenshtein over every
    within-block pair — the Ed-Join signature refinement must be EXACT
    (no false negatives from the q-gram prefix filter, none from the
    banded verify) for any suffix multiset, including empty suffixes,
    duplicate strings, and boundary distances. block_cap=0 forces every
    block through the signature path."""
    from etl_school_spark.dedup.edjoin import blocked_edit_distance_pairs

    prefix = "P" * 17
    names = [prefix + s for s in suffixes]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string"
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (i, j, lev(suffixes[i], suffixes[j]))
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(suffixes[i], suffixes[j]) <= max_dist
    }
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in blocked_edit_distance_pairs(
            df, "id", "name", prefix_len=17, max_dist=max_dist, block_cap=0,
            gram_order=order,
        ).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(_texts, _texts, st.integers(min_value=1, max_value=30))
def test_bigram_lm_perplexity_matches_python(spark, ref, texts, vocab_size):
    """CCNet-style LM scoring (functions/lm.py) vs an independent pure-
    Python train+score twin: same tokenization, same deterministic vocab
    tie-break, same add-k smoothing — per-doc perplexities must agree to
    float-reassociation tolerance, and <2-token docs must be absent."""
    from etl_school_spark.functions.lm import (
        perplexity_scores,
        py_reference_perplexity,
        train_bigram_lm,
    )

    # the twin's duplicated whitespace class must stay equivalent to
    # text.WS_CLASS (lm.py docstring contract): same splits on a probe
    # covering every class member and near-misses
    import re

    from etl_school_spark.functions.text import WS_CLASS

    probe = "a b\tc\nd\x0be\ff\rg\x1ch i"
    assert re.split(WS_CLASS, probe) == re.split("[ \t\n\x0b\f\r]+", probe)

    lm = train_bigram_lm(_df(spark, ref), "t", vocab_size)
    got = {
        r.i: r.ppl
        for r in perplexity_scores(_df(spark, texts), lm, "i", "t").collect()
    }
    want = py_reference_perplexity(ref, texts, vocab_size)
    for i, w in enumerate(want):
        if w is None:
            assert i not in got
        else:
            assert abs(got[i] - w) / w < 1e-9, (i, got[i], w)


@settings(max_examples=6, deadline=None)
@given(_texts, st.integers(min_value=1, max_value=30))
def test_self_perplexity_fusion_is_exact(spark, texts, vocab_size):
    """The r15 fused self-perplexity (one doc-keyed bigram stream feeding
    both the model counts and the scoring join) must emit EXACTLY the
    doubles of the two-pass train-on-self + score form it replaced —
    the model counts are invariant to which unique per-row key
    partitions the lag window, so no tolerance is allowed."""
    from etl_school_spark.functions.lm import (
        perplexity_scores,
        self_perplexity_scores,
        train_bigram_lm,
    )

    df = _df(spark, texts)
    lm = train_bigram_lm(df, "t", vocab_size)
    want = {
        (r.i): (r.ppl, r.n_bigrams)
        for r in perplexity_scores(df, lm, "i", "t").collect()
    }
    got = {
        (r.i): (r.ppl, r.n_bigrams)
        for r in self_perplexity_scores(df, "i", "t", vocab_size).collect()
    }
    assert got == want


def test_bigram_lm_ranks_fluent_below_gibberish(spark):
    """The signal the rule battery cannot express: a document drawn from
    the reference distribution scores LOWER perplexity than the same
    tokens shuffled."""
    import random

    from etl_school_spark.functions.lm import perplexity_scores, train_bigram_lm

    sent = "the cat sat on the mat and the dog sat on the rug"
    ref = [(i, sent) for i in range(20)]
    lm = train_bigram_lm(spark.createDataFrame(ref, "i long, t string"), "t", 50)

    rng = random.Random(3)
    shuffled = sent.split()
    rng.shuffle(shuffled)
    docs = spark.createDataFrame(
        [(1, sent), (2, " ".join(shuffled))], "i long, t string"
    )
    got = {r.i: r.ppl for r in perplexity_scores(docs, lm, "i", "t").collect()}
    assert got[1] < got[2]


# ---------------------------------------------------------------------------
# blocked_shortlist_scores (gemm.py, the r9 per-bucket tiling kernel) vs
# a brute-force numpy reference on random geometries — the planted
# hot-bucket integration test pins two block sizes end to end; this
# fuzzes the BLOCK BOUNDARIES (block = 1, block = |corpus|, block
# straddling the group, duplicate vectors at the local-k cut) on the
# pure pandas function directly. The kernel's contract: its output is a
# SUPERSET of every query's true top-local_k (ties included), and every
# emitted score is the exact sequential fold. The caller's rank window
# does the final cut, so supersets are correct by construction.
# ---------------------------------------------------------------------------
_vec_lists = st.lists(
    st.lists(st.integers(-3, 3).map(float), min_size=3, max_size=3),
    min_size=1,
    max_size=12,
).filter(lambda vs: all(any(x != 0.0 for x in v) for v in vs))


@settings(max_examples=25, deadline=None)
@given(qs=_vec_lists, cs=_vec_lists, k=st.integers(1, 4), block=st.integers(1, 14))
def test_blocked_shortlist_covers_topk_any_block(qs, cs, k, block):
    import numpy as np
    import pandas as pd

    from etl_school_spark.similarity.gemm import (
        _seq_fold_sum,
        blocked_shortlist_scores,
    )

    qdf = pd.DataFrame(
        {"query_id": range(len(qs)), "qv": qs,
         "_nq": [float(np.sqrt(_seq_fold_sum((np.array([v]) ** 2))[0])) for v in qs]}
    )
    cdf = pd.DataFrame(
        {"neighbor_id": range(len(cs)), "cv": cs,
         "_nc": [float(np.sqrt(_seq_fold_sum((np.array([v]) ** 2))[0])) for v in cs]}
    )
    out = blocked_shortlist_scores(qdf, cdf, k, block)
    got = {(int(r.query_id), int(r.neighbor_id)): r.score_raw for r in out.itertuples()}

    # brute-force exact scores, same fold order
    for qi, qv in enumerate(qs):
        scores = {}
        for ci, cv in enumerate(cs):
            P = np.array([[a * b for a, b in zip(qv, cv)]])
            d = _seq_fold_sum(P)[0]
            scores[ci] = d / (qdf["_nq"][qi] * cdf["_nc"][ci])
        cut = sorted(scores.values(), reverse=True)[min(k, len(cs)) - 1]
        for ci, s in scores.items():
            if s >= cut:  # every true top-k member (ties included)...
                assert (qi, ci) in got, (qi, ci, s, cut, block)
        for (gq, gc), gs in got.items():
            if gq == qi:  # ...and every emitted score is exact
                assert gs == scores[gc]


# ---------------------------------------------------------------------------
# blocked_pair_edges (gemm.py, the r10 per-cell threshold-pair kernel) vs
# a brute-force numpy reference on random geometries — same house rule as
# the shortlist kernel above, threshold form. Contract: the emitted pair
# set EQUALS the exact-fold all-pairs result (shortlist at threshold −
# margin can only over-select; the exact rescore decides), for any block
# size including 1 and |group|, duplicate vectors and exact-boundary
# thresholds included (thresholds are drawn FROM the exact pair scores,
# so >= boundary hits occur by construction).
# ---------------------------------------------------------------------------
@settings(max_examples=25, deadline=None)
@given(
    vs=_vec_lists,
    block=st.integers(1, 14),
    pick=st.integers(0, 10_000),
)
def test_blocked_pair_edges_exact_any_block(vs, block, pick):
    import numpy as np
    import pandas as pd

    from etl_school_spark.similarity.gemm import _seq_fold_sum, blocked_pair_edges

    norms = [float(np.sqrt(_seq_fold_sum(np.array([v]) ** 2)[0])) for v in vs]
    exact = {}
    for i in range(len(vs)):
        for j in range(i + 1, len(vs)):
            P = np.array([[a * b for a, b in zip(vs[i], vs[j])]])
            exact[(i, j)] = _seq_fold_sum(P)[0] / (norms[i] * norms[j])
    if exact:
        # half the examples pin an EXACT boundary (threshold == a score)
        scores = sorted(exact.values())
        threshold = (
            scores[pick % len(scores)] if pick % 2 == 0 else 0.25 + (pick % 100) / 200.0
        )
    else:
        threshold = 0.5
    pdf = pd.DataFrame({"vid": range(len(vs)), "v": vs, "_n": norms})
    out = blocked_pair_edges(pdf, float(threshold), block)
    got = {(int(r.id_a), int(r.id_b)) for r in out.itertuples()}
    want = {p for p, s in exact.items() if s >= threshold}
    assert got == want, (threshold, block, got ^ want)


# --------------------------------------------------------------------------
# PII scrubbing: three-engine differential (r14). The text_pii_scrub
# oracle's validity rests on "the same pattern runs identically on Spark
# (Java regex), DuckDB (RE2), and Python re". This property test feeds
# adversarial ASCII text — valid spans, near-misses (999.x IPs, bare
# a@b, short digit runs), separators, adjacent spans — through all three
# engines and asserts identical progressive counts AND redacted text.
# ASCII-only by design: \b is ASCII-word-boundary in RE2 but
# Unicode-aware in Python/Java, so the cross-engine guarantee (and the
# corpus contract) is scoped to ASCII text.
# --------------------------------------------------------------------------
_pii_frag = st.one_of(
    st.builds(lambda n: f"u{n}@ex{n % 7}.org", st.integers(0, 999)),
    st.just("user.name+tag@sub.example.co"),
    st.just("a@b"),  # near-miss: TLD too short
    st.builds(lambda n: f"https://ex.com/{n}?q=a@b.cc", st.integers(0, 99)),
    st.just("http://x.io/p"),
    st.builds(lambda a, b: f"{a % 300}.{b % 300}.1.2", st.integers(0, 999), st.integers(0, 999)),
    st.just("1.2.3"),  # near-miss: 3 octets
    st.just("+1-555-123-4567"),
    st.just("(02) 9876 5432"),
    st.just("12-34 56"),  # near-miss: groups too short
    st.text(alphabet=" aZ09.@-:/+()_%\t\n", max_size=12),
)
_pii_texts = st.lists(
    st.lists(_pii_frag, min_size=0, max_size=6).map(" ".join),
    min_size=1,
    max_size=6,
)


def _py_scrub(s: str):
    from etl_school_spark.privacy import PII_PATTERNS

    counts = {}
    for name, rx in PII_PATTERNS.items():
        counts[f"n_{name}"] = len(re.findall(rx, s))
        s = re.sub(rx, f"<{name.upper()}>", s)
    return s, counts


@settings(max_examples=15, deadline=None)
@given(_pii_texts)
def test_pii_scrub_three_engine_differential(spark, values):
    import duckdb
    import pandas as pd

    from etl_school_spark.privacy import PII_PATTERNS, scrub_corpus

    # engine 1: Spark (Java regex)
    df = _df(spark, values).withColumnRenamed("t", "text")
    got = {r.i: r for r in scrub_corpus(df, "text").collect()}

    # engine 2: DuckDB (RE2), same progressive CTE shape as the oracle
    con = duckdb.connect()
    con.register("pii_t", pd.DataFrame({"i": range(len(values)), "c": values}))
    sql, prev = "WITH s0 AS (SELECT i, c FROM pii_t)", "s0"
    for j, (name, rx) in enumerate(PII_PATTERNS.items(), 1):
        sql += (
            f", s{j} AS (SELECT * EXCLUDE (c), "
            f"len(regexp_extract_all(c, '{rx}')) AS n_{name}, "
            f"regexp_replace(c, '{rx}', '<{name.upper()}>', 'g') AS c FROM {prev})"
        )
        prev = f"s{j}"
    duck = con.execute(sql + f" SELECT * FROM {prev}").fetchdf().set_index("i")

    for i, text in enumerate(values):
        # engine 3: Python re
        red, counts = _py_scrub(text)
        g, d = got[i], duck.loc[i]
        assert g.text == red == d["c"], (text, g.text, red, d["c"])
        for k, v in counts.items():
            assert getattr(g, k) == v == int(d[k]), (text, k, getattr(g, k), v, int(d[k]))


def _py_chunks(s: str, k: int = 64, stride: int = 48):
    toks = _py_tokens(s)
    out = []
    for ci, start in enumerate(range(0, len(toks), stride)):
        win = toks[start : start + k]
        out.append((ci, len(win), " ".join(win)))
    return out


@_S
@given(_texts)
def test_doc_chunks_match_python_reference(spark, values):
    """r14: fixed-window/stride context chunking — Spark's
    sequence+posexplode+slice pipeline must equal the obvious Python
    slicing, including the one-chunk empty-text case and the final
    short window."""
    from etl_school_spark.workload.textops import _CHUNK_STRIDE, _CHUNK_TOKENS

    df = _df(spark, values).withColumnRenamed("t", "text")
    toks = F.split(F.trim(F.col("text")), f"{_JAVA_WS}+")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(_CHUNK_STRIDE))
    rows = (
        df.select("i", toks.alias("w"), F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "i",
            "chunk_id",
            F.least(F.lit(_CHUNK_TOKENS), F.size("w") - F.col("start")).alias("n"),
            F.array_join(F.slice("w", F.col("start") + 1, F.lit(_CHUNK_TOKENS)), " ").alias("c"),
        )
        .collect()
    )
    got = {}
    for r in rows:
        got.setdefault(r.i, []).append((r.chunk_id, r.n, r.c))
    for i, text in enumerate(values):
        want = _py_chunks(text, _CHUNK_TOKENS, _CHUNK_STRIDE)
        assert sorted(got[i]) == want, (text, got[i], want)
