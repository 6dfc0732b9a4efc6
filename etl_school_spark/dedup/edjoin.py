"""Adaptive blocked edit-distance join — entity matching whose candidate
set stays bounded as the corpus densifies.

The r3 scale audit (SCALING.md) pinned the lesson this module encodes: a
FIXED blocking key degrades as duplicates accumulate — block sizes, and
with them the per-block quadratic candidate count, grow with corpus
density. The fix is adaptive: block sizes are MEASURED, and only blocks
past ``block_cap`` (the tail of the size distribution) pay a second,
finer blocking stage; small blocks keep the plain self-join.

The refinement is the Ed-Join prefix-filter (Xiao, Wang, Lin — "Ed-Join:
an efficient algorithm for similarity joins with edit distance
constraints", PVLDB 2008), and it is EXACT, not heuristic:

- within a block all strings share the ``prefix_len``-char prefix, and a
  shared prefix never changes edit distance, so only the SUFFIXES matter;
- one edit operation destroys at most ``q`` of a padded suffix's
  occurrence-tagged q-grams, so strings within distance ``max_dist``
  differ in at most q·d multiset grams;
- therefore any matching pair must share at least one gram among the
  q·d+1 smallest grams — under any fixed total order; rarest-first
  (global-frequency) by default, with a zero-extra-pass lexicographic
  option (``gram_order``) — of each side: the SIGNATURE. Joining on
  (block, signature gram) loses no true pair, while diverse oversized
  blocks fragment into signature buckets instead of exploding
  quadratically.

SHORT-STRING COMPLETENESS (found by the hypothesis differential test —
suffixes '' vs 'a' at d=1 share no gram at all): the prefix-filter
overlap bound max(|Gₐ|,|G_b|) − q·d is vacuous when the padded suffix
has ≤ q·d grams, so gram overlap guarantees nothing for such strings.
Every row short enough to be IN that regime — or within ``max_dist``
characters of it, i.e. a possible partner — additionally carries a
universal catch-all gram (chr(3), no real gram starts with it): pairs
with a short member collide through it by construction, and since a
partner of a short string is at most ``max_dist`` longer, the catch-all
bucket holds only bounded-length suffixes per block.

A pair sharing several signature grams is emitted exactly once, at its
lexicographically smallest shared gram — an array_min(array_intersect)
check inside the join stage, no dedup shuffle (the knn.py
first-collision pattern, in string-array form).

The verify stage is threshold-aware and prefix-stripped: a shared prefix
never changes edit distance (ed(p·s, p·t) = ed(s, t) — an optimal
alignment can always match the common prefix), so the DP runs on the
SUFFIXES only; byte-equal suffixes short-circuit to distance 0 (the
dominant case in dup-dense corpora) and the rest run Spark's banded
``levenshtein(a, b, threshold)`` — O(d·suffix_len) cells instead of
O(name_len²). On the sf1 scale fixture (150 k names, 100-member blocks,
1-char suffixes) this turns the verify from the dominant cost into
noise.

Reference parity: the reference has no entity-resolution operator; this
generalizes its exact-match lookup shapes (SURVEY §2 J-family) to the
fuzzy regime a 100 TB dedup pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# padding sentinels for suffix q-grams: control chars (chr(1)/chr(2)) no
# real name uses; padding guarantees >= 1 gram even for empty suffixes
# (two names equal up to the blocking prefix MUST still collide)
_PAD_L = "chr(1)"
_PAD_R = "chr(2)"


def _tagged_grams_sql(suffix_expr: str, q: int) -> str:
    """SQL for ALL occurrence-tagged q-grams of the padded suffix.
    Occurrence tags ('gram#k' for the k-th occurrence) make the gram
    multiset a set, which the one-edit-destroys-at-most-q bound needs;
    the O(len²) inner filter is fine at name length."""
    p = f"concat({_PAD_L}, {suffix_expr}, {_PAD_R})"
    gram = f"substring(p, i, {q})"
    gram_j = f"substring(p, j, {q})"
    tagged = (
        f"transform(sequence(1, length(p) - {q - 1}), i -> "
        f"concat({gram}, '#', size(filter(sequence(1, i), j -> {gram_j} = {gram}))))"
    )
    # let-bind the padded string via a single-element transform so the
    # concat is not re-evaluated per gram position
    return f"transform(array({p}), p -> {tagged})[0]"


def _signature_sql(suffix_expr: str, q: int, max_dist: int) -> str:
    """SQL for the Ed-Join prefix signature of ``suffix_expr``: the
    q·max_dist+1 LEXICOGRAPHICALLY smallest occurrence-tagged q-grams of
    the padded suffix (any fixed total order is correct; see
    edit_blocked_candidates for the frequency-ordered variant)."""
    k = q * max_dist + 1
    return f"slice(array_sort({_tagged_grams_sql(suffix_expr, q)}), 1, {k})"


def edit_blocked_candidates(
    df: DataFrame,
    id_col: str,
    name_col: str,
    prefix_len: int = 17,
    max_dist: int = 2,
    q: int = 2,
    block_cap: int = 128,
    gram_order: str = "freq",
) -> DataFrame:
    """Candidate pairs (id_a < id_b, sfx_a, sfx_b) within blocks of the
    ``prefix_len``-char prefix — plain self-join for blocks ≤ block_cap,
    exact signature-refined join for oversized blocks. Superset of all
    pairs with edit distance ≤ max_dist inside a block; exposed so tests
    can assert candidate bounds directly. Only the SUFFIX rides the join
    (the shared prefix carries no edit-distance information and would
    just widen every shuffled row).

    ``gram_order`` picks the global total order that defines each row's
    signature — EXACTNESS does not depend on it (any fixed order
    satisfies the prefix lemma), PRUNING does:

    - "freq" (default, the classic Ed-Join choice): grams ordered by
      (global occurrence count asc, gram) measured over the oversized
      blocks themselves — signatures keep each row's RAREST grams, so
      signature buckets are maximally selective. Costs one extra
      aggregate + join + per-row window over the tail blocks only.
    - "lex": lexicographic — zero extra passes (the signature is a pure
      per-row expression); the fallback when the tail is tiny and the
      frequency pass isn't worth its scheduling.
    """
    c = df.select(
        F.col(id_col).alias("id"),
        F.substring(name_col, 1, prefix_len).alias("blk"),
        F.substring(F.col(name_col), prefix_len + 1, 2147483647).alias("sfx"),
    )
    sizes = c.groupBy("blk").agg(F.count(F.lit(1)).alias("_sz"))
    c = c.join(sizes, "blk")

    small = c.filter(F.col("_sz") <= block_cap)
    pairs_small = (
        small.alias("a")
        .join(
            small.alias("b"),
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sfx").alias("sfx_a"),
            F.col("b.sfx").alias("sfx_b"),
        )
    )

    big0 = c.filter(F.col("_sz") > block_cap)
    k = q * max_dist + 1
    if gram_order == "freq":
        from pyspark.sql.window import Window

        # global gram frequencies over the tail blocks; the freq-prefixed
        # key makes lexicographic order == (freq asc, gram) order, so the
        # same array_min exactly-once trick applies unchanged
        exg = big0.select(
            "blk", "id", F.explode(F.expr(_tagged_grams_sql("sfx", q))).alias("g")
        )
        freq = exg.groupBy("g").agg(F.count(F.lit(1)).alias("_f"))
        keyed = exg.join(freq, "g").select(
            "blk",
            "id",
            F.concat(
                F.lpad(F.col("_f").cast("string"), 12, "0"), F.lit("#"), F.col("g")
            ).alias("kg"),
        )
        wsig = Window.partitionBy("id").orderBy("kg")
        sigs = (
            keyed.withColumn("_rn", F.row_number().over(wsig))
            .filter(F.col("_rn") <= k)
            .groupBy("id")
            .agg(F.sort_array(F.collect_list("kg")).alias("sig0"))
        )
        big0 = big0.join(sigs, "id")
        sig = "sig0"
    elif gram_order == "lex":
        big0 = big0.withColumn("sig0", F.expr(_signature_sql("sfx", q, max_dist)))
        sig = "sig0"
    else:
        raise ValueError(f"gram_order must be 'freq' or 'lex', got {gram_order!r}")
    # short-string completeness (module docstring): padded gram count =
    # length(sfx) + 3 - q, vacuous-bound regime at <= q·d grams, partners
    # within max_dist chars of it — all carry the catch-all gram
    short_len = q * max_dist + q - 3 + max_dist
    big = big0.withColumn(
        "sig",
        F.expr(
            f"CASE WHEN length(sfx) <= {short_len} "
            f"THEN array_union({sig}, array(chr(3))) ELSE {sig} END"
        ),
    ).drop("sig0")
    ex = big.select("blk", "id", "sfx", "sig", F.explode("sig").alias("g"))
    pairs_big = (
        ex.alias("a")
        .join(ex.alias("b"), ["blk", "g"])
        .filter(F.col("a.id") < F.col("b.id"))
        # exactly-once: keep the pair only at its smallest shared
        # signature gram — no dedup shuffle
        .filter(
            F.col("g")
            == F.array_min(F.array_intersect(F.col("a.sig"), F.col("b.sig")))
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sfx").alias("sfx_a"),
            F.col("b.sfx").alias("sfx_b"),
        )
    )
    return pairs_small.unionByName(pairs_big)


def blocked_edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    prefix_len: int = 17,
    max_dist: int = 2,
    q: int = 2,
    block_cap: int = 128,
    gram_order: str = "freq",
) -> DataFrame:
    """All pairs (id_a < id_b, dist) sharing the ``prefix_len``-char
    blocking prefix with levenshtein(name_a, name_b) ≤ max_dist — the
    same contract as the fixed-key blocked join, with candidates bounded
    per block (see module docstring)."""
    from etl_school_spark.tables import fan_out

    df = fan_out(df)  # q-gram signature scan is pre-shuffle fold work
    cand = edit_blocked_candidates(
        df, id_col, name_col, prefix_len, max_dist, q, block_cap, gram_order
    )
    # prefix-stripped verify: ed(full names) = ed(suffixes) given the
    # shared block prefix; banded DP is O(max_dist · suffix_len) per
    # pair, -1 when the band is exceeded (filtered next) — exact for
    # every surviving distance
    dist = F.when(F.col("sfx_a") == F.col("sfx_b"), F.lit(0)).otherwise(
        F.levenshtein(F.col("sfx_a"), F.col("sfx_b"), max_dist)
    )
    return (
        cand.withColumn("dist", dist.cast("long"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("id_a", "id_b", "dist")
    )
