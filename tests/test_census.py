"""Registry storage-census CI gate (r14, VERDICT item 4).

r12 found the dedup quotient leaking O(star-edges) storage blocks per
call; r13 fixed the operators and added tools/census_registry.py as a
diagnostic. This test pins the fix as an invariant: every registered
query, run once at sf0.001, may retain AT MOST its documented residual
(default 1 — the returned frame's own truncation leaf, caller-owned by
convention; the two suite queries that hand a shared leaf to several
branches carry explicit allowances in tools/census_registry.ALLOWANCES).
A future operator change that silently re-opens the accumulation fails
here, not in a long-lived production session.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_registry_storage_census_within_allowances(spark):
    from tools.census_registry import ALLOWANCES, DEFAULT_ALLOWANCE, census

    res = census(spark, "/root/testdata/sf0.001")
    assert len(res) >= 50, sorted(res)  # the full registry actually ran
    errs = {k: v for k, v in res.items() if isinstance(v, str)}
    assert not errs, errs
    over = {
        k: (v, ALLOWANCES.get(k, DEFAULT_ALLOWANCE))
        for k, v in res.items()
        if isinstance(v, int) and v > ALLOWANCES.get(k, DEFAULT_ALLOWANCE)
    }
    # growth is measured per query (before/after), so pre-existing blocks
    # from earlier tests in the shared session cannot inflate it.
    # Reclaimable leaves (referenced only by dead Python locals — e.g.
    # the minhash suite's shared sets/signed scans) sit in storage until
    # a driver GC lets the ContextCleaner unpersist them, which made the
    # raw count GC-timing-dependent (flaky +1/+2 on dedup_minhash_lsh);
    # census() therefore forces the gc dance on over-allowance readings
    # and reports what SURVIVES it — structural retention. A true leak
    # is strongly referenced and never shrinks, so gc cannot mask one.
    assert not over, f"storage residual above documented allowance: {over}"
