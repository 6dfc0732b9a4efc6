"""Rule-based corpus filtering for LLM training pipelines — the classic
C4 / Gopher heuristic battery composed from this engine's text
expressions, entirely JVM-side (no UDFs, embarrassingly parallel, no
shuffle: the 100 TB shape is scan → flag → filter → write).

Public heuristics re-expressed (C4: Raffel et al. 2020 §2.2; Gopher:
Rae et al. 2021 §A1.1; both are published rule lists, re-implemented
from the papers' descriptions):

- document length bounds (token count within [min_tokens, max_tokens])
- mean word length within [3, 10]
- stopword share ≥ threshold (natural-language-ness signal)
- alphabetic-character share ≥ threshold (symbol/boilerplate screen)
- repetition screens: top word / top n-gram share and duplicate n-gram
  fraction below thresholds
- terminal-punctuation line share ≥ threshold (C4's "lines ending in a
  terminal punctuation mark", lifted to a per-document ratio)

``corpus_flags`` ANNOTATES (one boolean per rule + the conjunction) so a
pipeline can audit WHY documents drop; ``filter_corpus`` keeps the
survivors. Thresholds are keyword arguments — the defaults follow the
papers where the papers give numbers.

Reference analog: none (the reference has no corpus-filtering surface);
this belongs to the engine's training-data-pipeline extension alongside
dedup/ and similarity/.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_school_spark.functions.text import (
    WS_CLASS,
    dup_ngram_frac,
    stopword_share,
    token_count,
    tokens,
    top_ngram_share,
    top_word_share,
)


def mean_word_length(col: Column | str) -> Column:
    """Mean token length in characters, 4-decimal rounded (NULL-safe:
    empty docs yield NULL, which fails the range rule)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n = F.size(toks)
    return F.round(total / F.nullif(n, F.lit(0)), 4)


def alpha_share(col: Column | str) -> Column:
    """Share of non-whitespace characters that are ASCII letters."""
    c = F.col(col) if isinstance(col, str) else col
    dense = F.regexp_replace(c, WS_CLASS, "")
    n_alpha = F.length(F.regexp_replace(dense, r"[^A-Za-z]", ""))
    return F.round(n_alpha / F.nullif(F.length(dense), F.lit(0)), 4)


def terminal_punct_line_share(col: Column | str) -> Column:
    """Share of non-empty lines ending in . ! ? or closing quote — the
    C4 line rule as a per-document ratio."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(F.split(c, r"\n"), lambda ln: F.trim(ln) != "")
    ok = F.filter(lines, lambda ln: F.trim(ln).rlike(r"""[.!?]["')\]]?$"""))
    return F.round(F.size(ok) / F.nullif(F.size(lines), F.lit(0)), 4)


def corpus_flags(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stopword_share: float = 0.06,
    min_alpha_share: float = 0.70,
    max_top_word_share: float = 0.20,
    max_top_bigram_share: float = 0.18,
    max_dup_trigram_frac: float = 0.30,
    min_terminal_punct_share: float = 0.0,
    emit_metrics: bool = False,
) -> DataFrame:
    """Annotate each document with one boolean per heuristic and the
    conjunction ``keep``. NULL metric (empty doc) fails its rule.

    ``emit_metrics`` additionally outputs the underlying metric columns
    (``n_tokens``, ``mean_word_len``, ``stop_share``, ``alpha_share``,
    ``top_word_share``, ``top_2gram_share``, ``dup_3gram_frac``,
    ``term_punct_share``). Each metric is built as ONE Column object
    shared between its flag and its output slot — identical expression
    trees (lambda IDs included), so whole-stage codegen's subexpression
    elimination evaluates the expensive per-row folds once; a caller
    re-deriving the same metric with a fresh call would get a fresh
    lambda ID and pay for it twice."""
    t = F.col(text_col)
    metrics = {
        "n_tokens": token_count(t),
        "mean_word_len": mean_word_length(t),
        "stop_share": stopword_share(t),
        "alpha_share": alpha_share(t),
        "top_word_share": top_word_share(t),
        "top_2gram_share": top_ngram_share(t, 2),
        "dup_3gram_frac": dup_ngram_frac(t, 3),
        "term_punct_share": terminal_punct_line_share(t),
    }
    m = metrics
    rules = {
        "ok_len": (m["n_tokens"] >= min_tokens) & (m["n_tokens"] <= max_tokens),
        "ok_word_len": (m["mean_word_len"] >= min_mean_word_len)
        & (m["mean_word_len"] <= max_mean_word_len),
        "ok_stopwords": m["stop_share"] >= min_stopword_share,
        "ok_alpha": m["alpha_share"] >= min_alpha_share,
        "ok_rep_word": m["top_word_share"] <= max_top_word_share,
        "ok_rep_bigram": m["top_2gram_share"] <= max_top_bigram_share,
        "ok_rep_dup": m["dup_3gram_frac"] <= max_dup_trigram_frac,
        "ok_term_punct": m["term_punct_share"] >= min_terminal_punct_share,
    }
    # replace-on-collision like the withColumn form this select replaced:
    # re-annotating a frame that already carries flag/metric columns (e.g.
    # corpus_flags of an audited corpus) must overwrite, not append an
    # ambiguous duplicate
    appended = set(rules) | {"keep"} | (set(metrics) if emit_metrics else set())
    sel = [c for c in docs.columns if c not in appended]
    if emit_metrics:
        sel += [c.alias(name) for name, c in metrics.items()]
    flag_names = list(rules)
    sel += [
        F.coalesce(pred, F.lit(False)).alias(name)  # NULL metric → rule fails
        for name, pred in rules.items()
    ]
    out = docs.select(*sel)
    keep = F.lit(True)
    for name in flag_names:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


def filter_corpus(docs: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """The C4/Gopher battery as a filter: survivors only, original
    columns."""
    flagged = corpus_flags(docs, text_col, **thresholds)
    return flagged.filter(F.col("keep")).select(*docs.columns)


def paragraphs(col: Column | str) -> Column:
    """Non-empty trimmed paragraphs (newline-separated blocks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(c, r"\n+"), lambda p: F.trim(p)),
        lambda p: p != "",
    )


def drop_duplicate_paragraphs(col: Column | str) -> Column:
    """Intra-document dedup (the C4-style within-doc cleanup): keep only
    the FIRST occurrence of each paragraph, preserving order, and rejoin
    with single newlines. Boilerplate that repeats inside one document
    (nav bars, cookie banners, chorus lines) is the dominant in-doc noise
    a crawl corpus carries; this removes it without touching cross-doc
    dedup. Pure expressions — order-preserving first-occurrence selection
    via array_position, O(P²) per row in paragraph count (P is small)."""
    def dedup(ps: Column) -> Column:
        # guard: sequence(1, 0) would DESCEND for empty docs, and ANSI
        # element_at throws on out-of-range indexes
        idx = F.when(F.size(ps) > 0, F.sequence(F.lit(1), F.size(ps))).otherwise(
            F.array().cast("array<int>")
        )
        keep = F.filter(
            idx, lambda i: F.array_position(ps, F.element_at(ps, i)) == i
        )
        return F.array_join(F.transform(keep, lambda i: F.element_at(ps, i)), "\n")

    from etl_school_spark.functions.text import let_bound

    return let_bound(paragraphs(col), dedup)
