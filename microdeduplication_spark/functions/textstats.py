"""Text-analysis functions for a training-data pipeline over `documents`.

All pure Column expressions (JVM, whole-stage codegen): token counting,
quality scoring, n-gram language identification, rolling document
fingerprints. Each has a `queries()` entry in __spark_entry__.py with a
DuckDB oracle, so every formula here is deliberately expressible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram language-ID heuristic.
# Ordered dict of language -> marker words; score = marker hits per token.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "dans"],
    "es": ["el", "la", "los", "de", "que", "es", "una", "por", "con"],
}

STOPWORDS_EN = LANG_MARKERS["en"]


def whitespace_token_count(col: Column) -> Column:
    """Number of whitespace-separated tokens (long)."""
    toks = F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != F.lit(""))
    return F.size(toks).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """Approximate subword count with a BPE-ish regex split: words, digits runs
    and single punctuation marks each count as one token."""
    pieces = F.filter(
        F.split(col, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
        lambda t: (t != F.lit("")) & (t != F.lit(" ")),
    )
    return F.size(pieces).cast("long")


def word_tokens_lower(col: Column) -> Column:
    """array<string> lowercase word tokens ([a-z0-9]+ runs)."""
    return F.filter(
        F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    toks = word_tokens_lower(col)
    words = list(stopwords or STOPWORDS_EN)
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars."""
    n = F.length(col)
    npunct = n - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(n > 0, npunct / n).otherwise(F.lit(0.0))


def mean_word_length(col: Column) -> Column:
    toks = word_tokens_lower(col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic (Gopher/C4-style signals, simplified):
    rewards normal word length, some stopwords, moderate punctuation, and
    length >= 200 chars. Deterministic, SQL-expressible."""
    mwl = mean_word_length(col)
    sw = stopword_ratio(col)
    pr = punct_ratio(col)
    length_ok = (F.length(col) >= 200).cast("double")
    wl_ok = ((mwl >= 3.0) & (mwl <= 10.0)).cast("double")
    sw_ok = (sw >= 0.05).cast("double")
    punct_ok = (pr <= 0.2).cast("double")
    return (length_ok + wl_ok + sw_ok + punct_ok) / F.lit(4.0)


def lang_id(col: Column) -> Column:
    """Heuristic language ID: language with the highest marker-word hit count;
    'und' (undetermined) when no markers hit."""
    toks = word_tokens_lower(col)

    def _hits(markers: list[str]) -> Column:
        # closure factory: F.filter treats a 2-arg lambda as (element, index),
        # so the marker list must be bound outside the lambda signature
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = [(lang, _hits(markers)) for lang, markers in LANG_MARKERS.items()]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # reversed so that on ties the FIRST language in LANG_MARKERS order wins
    for lang, s in reversed(scores):
        expr = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(expr)
    return expr


def rolling_fingerprint(toks: Column, window: int = 4) -> Column:
    """Document fingerprint: xor of a 32-bit hash over each `window`-token
    shingle of the word stream (order-sensitive rolling hash). Stable under
    whitespace changes, sensitive to word order.

    Hash family: first 8 hex digits of md5 of the space-joined window --
    chosen over xxhash64 because it is reproducible in any engine (DuckDB:
    ('0x' || substr(md5(w),1,8))::BIGINT), making the fingerprint
    cross-engine verifiable; the fingerprint's job is dedup-key identity,
    not adversarial collision resistance.

    `toks` must be a MATERIALIZED token-array column (word_tokens_lower
    aliased in a prior select) -- the transform lambda references it per
    window, and an inline expression would be re-evaluated per element
    (see functions/text.py shingle_hashes performance contract)."""
    n = F.size(toks)
    shingle_hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(n - F.lit(window), F.lit(0))),
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i + F.lit(1), window))), 1, 8),
            16, 10,
        ).cast("long"),
    )
    return F.aggregate(
        shingle_hashes,
        F.lit(0).cast("long"),
        lambda acc, h: acc.bitwiseXOR(h),
    )
