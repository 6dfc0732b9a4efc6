"""Text-analysis functions for training-data pipelines.

All pure Catalyst expressions (split / transform / filter / aggregate /
md5) — they run inside whole-stage codegen and scale linearly with
input size; no Python in the data path. Hashing is md5-based throughout
so every derived value is reproducible in ANSI SQL (driver-oracle-checkable).

Components: tokenization, word shingles, token stats, stopword/quality
scoring, language-ID heuristic, document fingerprinting, SimHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Frequent-word markers per language for the lang-ID heuristic.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
    "es": ["el", "los", "que", "y", "una"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


# Explicit whitespace class shared by the Spark expressions and the DuckDB
# oracle SQL. Java's \s is [ \t\n\x0B\f\r] while RE2 (DuckDB) \s omits \x0B
# — spelling the class out makes both engines tokenize identically BY
# CONSTRUCTION instead of by absence of vertical tabs in the data. Both
# regex dialects accept the \xhh escape, so the same literal serves both.
WS_CLASS = r"[ \t\n\x0B\f\r]+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (explicit Java-\\s class, see WS_CLASS)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), WS_CLASS)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def regex_token_count(col: Column | str, pattern: str = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]") -> Column:
    """BPE-ish token counting: count regex token matches (letters runs,
    digit runs, single punctuation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """All word n-grams in order, duplicates kept (repetition metrics need
    the multiset). Documents shorter than n words get an empty list (guard
    needed: sequence(1, 0) would count DOWN).

    Built by zipping the token array with its own shifted slices — one
    O(L) pass per gram position. The per-position formulation
    (transform over positions, slice(w, i, n) per element) allocates an
    array per gram and measured ~4× slower on the repetition metrics;
    zip_with's null-padding tail (where a shift runs past the end) is cut
    by the final slice, so gram strings are identical."""

    def over_tokens(w: Column) -> Column:
        L = F.size(w)
        g = w
        for k in range(1, n):
            g = F.zip_with(
                g,
                F.slice(w, k + 1, F.greatest(L, F.lit(1))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return F.when(L >= n, F.slice(g, 1, L - (n - 1))).otherwise(
            F.array().cast("array<string>")
        )

    return let_bound(tokens(col), over_tokens)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles."""
    return F.array_distinct(word_ngrams(col, n))


def stopword_share(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Share of tokens that are stopwords, 4-decimal rounded."""
    w = tokens(col)
    sw = F.array([F.lit(s) for s in (stopwords or STOPWORDS)])
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(sw, t)))
    return F.round(n_stop.cast("double") / F.nullif(F.size(w), F.lit(0)), 4)


def quality_score(col: Column | str) -> Column:
    """Deterministic document-quality heuristic in [0,1]:
    rewards reasonable length, penalizes very low type/token ratio
    (boilerplate repetition) and extreme stopword share. The exact formula
    is arbitrary but fixed — what matters for a pipeline is determinism and
    monotonicity in the signals (length, lexical diversity, stopwords)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    ttr = distinct_token_count(c).cast("double") / F.nullif(n_tok, F.lit(0))
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw = stopword_share(c)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.1))
    return F.round((len_score + ttr + sw_score) / 3.0, 4)


def lang_id(col: Column | str) -> Column:
    """Marker-word language-ID heuristic: count hits from each language's
    frequent-word list; highest count wins (ties broken by a fixed language
    order); no hits at all → 'und' (undetermined)."""
    w = F.array_distinct(tokens(col))
    scores = []
    for lang_code, markers in LANG_MARKERS.items():
        marker_arr = F.array([F.lit(m) for m in markers])
        scores.append(
            (lang_code, F.size(F.filter(w, lambda t: F.array_contains(marker_arr, t))))
        )
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in reverse priority so earlier languages win ties
    for lang_code, score in reversed(scores):
        take = score >= best_score
        best = F.when(take & (score > 0), F.lit(lang_code)).otherwise(best)
        best_score = F.when(take, score).otherwise(best_score)
    return best


def let_bound(value: Column, body) -> Column:
    """Let-binding for Catalyst expressions: evaluate ``value`` ONCE and
    reference it many times inside ``body``. Spark does no common-
    subexpression elimination inside higher-order-function lambdas, so an
    expression referenced per element (e.g. a sorted array indexed inside
    a filter) would otherwise be re-computed per element — turning an
    O(L log L) metric into O(L² log L). A lambda variable IS a
    materialized value, so wrapping in a single-element-array transform
    gives the binding."""
    return F.element_at(F.transform(F.array(value), body), 1)


def max_frequency(arr: Column) -> Column:
    """Highest frequency of any element in a string array, as a long.

    Sort, find run starts, take the max gap between consecutive starts —
    O(L log L) per ROW and zero shuffles, so a corpus-wide repetition
    profile is embarrassingly parallel (contrast the explode + groupBy
    shape, which shuffles ~L rows per document across the cluster twice).
    Implemented over integer position arrays rather than a struct-
    accumulator fold: per-element struct allocation made the fold the
    single slowest text metric (~4× this formulation, measured at sf0.1).
    Empty array -> 0.
    """
    def over_sorted(s: Column) -> Column:
        n = F.size(s)
        # 1-based positions where a new run of equal values begins
        starts = F.filter(
            F.sequence(F.lit(1), n),
            lambda i: F.when(i == 1, F.lit(True)).otherwise(
                ~F.element_at(s, i).eqNullSafe(F.element_at(s, i - 1))
            ),
        )

        def over_starts(st: Column) -> Column:
            # sentinel end position → run length = next start − this start
            runs = F.zip_with(
                F.concat(F.slice(st, 2, F.greatest(n, F.lit(1))), F.array(n + 1)),
                st,
                lambda nxt, cur: nxt - cur,
            )
            return F.array_max(runs)

        return F.when(n > 0, let_bound(starts, over_starts)).otherwise(F.lit(0))

    return let_bound(F.array_sort(arr), over_sorted).cast("long")


def top_word_share(col: Column | str) -> Column:
    """Gopher-style repetition signal: share of tokens taken by the single
    most frequent token (Rae et al. 2021 §A1.1 use the analogous top
    n-gram character fraction). 4-decimal rounded; null for empty docs."""
    w = tokens(col)
    return F.round(
        max_frequency(w).cast("double") / F.nullif(F.size(w), F.lit(0)).cast("double"), 4
    )


def top_ngram_share(col: Column | str, n: int = 2) -> Column:
    """Share of word n-gram occurrences taken by the most frequent n-gram.
    Null when the document has fewer than n tokens."""
    g = word_ngrams(col, n)
    return F.round(
        max_frequency(g).cast("double") / F.nullif(F.size(g), F.lit(0)).cast("double"), 4
    )


def dup_ngram_frac(col: Column | str, n: int = 3) -> Column:
    """Fraction of word n-gram occurrences that are repeats of an earlier
    occurrence (1 - distinct/total). High values flag boilerplate /
    templated text. Null when the document has fewer than n tokens."""
    g = word_ngrams(col, n)
    total = F.nullif(F.size(g), F.lit(0)).cast("double")
    return F.round(F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / total, 4)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text. Identical content (modulo spacing/case) → identical fingerprint."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), WS_CLASS, " ")))


# bit p (p=0 is the MSB) of a hex digit is set iff the digit is in this set
HEX_BIT_SETS = ["89abcdef", "4567cdef", "2367abef", "13579bdf"]


def _signed64(mask: int) -> int:
    """Two's-complement signed value of an unsigned 64-bit mask (bit 63
    flips the sign in a Spark BIGINT literal)."""
    return mask - (1 << 64) if mask >= (1 << 63) else mask


def _simhash_bit_sums(col: Column | str) -> Column:
    """The 64 ±contribution sums underlying SimHash (array<long>): for
    each bit k, the number of distinct tokens whose md5 sets bit k minus
    the number that clear it.

    Bit k is bit (k%4) of hex digit (k//4) with p=0 the digit's MSB —
    i.e. exactly bit (31-k) of the first 32 md5 bits for k<32 and bit
    (63-k) of the next 32 for k>=32 (md5's big-endian bit order). The
    driver oracle extracts the same bits by hex-digit set membership
    (HEX_BIT_SETS — ANSI-SQL-portable); here each token's two 32-bit
    halves are parsed ONCE with conv() and every bit is a long
    shift+mask, because higher-order-function lambdas evaluate
    interpreted (outside whole-stage codegen) and the previous
    per-bit substring+isin form paid 8 string compares per bit per
    token (r8, measured: the signature scan dropped ~3x)."""
    w = F.array_distinct(tokens(col))

    def _half(t: Column, start: int) -> Column:
        # 8 hex chars < 2^32: the string->long cast cannot overflow
        return F.conv(F.substring(F.md5(t), start, 8), 16, 10).cast("long")

    # conv once per token (fold lambdas re-evaluate per ELEMENT, so the
    # halves are materialized into the array, not recomputed per bit)
    hashes = F.transform(
        w, lambda t: F.struct(_half(t, 1).alias("hi"), _half(t, 9).alias("lo"))
    )
    zero64 = F.array_repeat(F.lit(0).cast("long"), 64)

    def contrib(acc: Column, h: Column) -> Column:
        bits = F.array(
            *[
                (
                    F.shiftright(h["hi" if k < 32 else "lo"], (31 - k) % 32)
                    .bitwiseAND(F.lit(1))
                    * 2
                    - 1
                ).cast("long")
                for k in range(64)
            ]
        )
        return F.zip_with(acc, bits, lambda a, b: a + b)

    return F.aggregate(hashes, zero64, contrib)


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash over the distinct token set as an array<int> of ±bit
    sums turned into 0/1 bits (bit k = 1 iff the sum of per-token bit-k
    contributions is positive). Token bits are the first 64 bits of
    md5(token), read as hex digits — bit k is bit (k%4) of hex digit
    (k//4), extracted by set membership so the whole signature is
    engine-portable (the identical extraction is expressible in ANSI SQL,
    which is what makes the SimHash query driver-oracle-checkable).

    Returned as array<int> of length 64 (bit vector) — callers pack bands
    or compute hamming distance with zip_with, all expression-side.
    """
    sums = _simhash_bit_sums(col)
    return F.transform(sums, lambda s: F.when(s > 0, F.lit(1)).otherwise(F.lit(0)))


def simhash64_packed(col: Column | str) -> Column:
    """The same 64 SimHash bits packed into ONE BIGNT word: bit k of the
    word = element k of ``simhash64`` (two's complement carries bit 63).

    The word form is what the pair join wants at scale — bucket keys are
    masked words, pair dedup is an XOR+AND filter, and hamming distance
    is ``bit_count(a XOR b)`` — no 64-element arrays ride the shuffle
    (the r3 sf1 run killed the session on exactly that: dense chunk
    blocks × ~500-byte signature arrays on both join sides)."""
    sums = _simhash_bit_sums(col)
    weights = F.array(*[F.lit(_signed64(1 << k)).cast("long") for k in range(64)])
    terms = F.zip_with(
        sums, weights, lambda s, wt: F.when(s > 0, wt).otherwise(F.lit(0).cast("long"))
    )
    # bits are disjoint powers of two (bit 63 carried by the one negative
    # weight), so the sum is exact two's-complement assembly — no overflow
    return F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x)


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length 0/1 bit arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.when(x == y, F.lit(0)).otherwise(F.lit(1))),
        F.lit(0),
        lambda acc, v: acc + v,
    )
