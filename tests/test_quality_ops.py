"""Repetition signals (Gopher A1.1) and PII scrub: planted-case tests."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from microdeduplication_spark.functions import pii
from microdeduplication_spark.operators.repetition import repetition_stats


def _rep(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in repetition_stats(df).collect()
    }


def test_repetition_planted_cases(spark):
    rows = [
        (1, "spam ham spam ham spam ham spam ham"),   # one 2-gram dominates
        # clean doc long enough that no single 2-gram can cover 20% of chars
        # (the Gopher threshold presumes web-document length)
        (2, "alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango"),
        (3, "word"),                                   # single token
        (4, ""),                                       # empty
        (5, "x x x x x x x x x x"),                    # total duplication
    ]
    got = _rep(spark, rows)

    # doc 1: 8 tokens, 2 distinct -> dup = 0.75; grams: "spam ham" x4,
    # "ham spam" x3, top cover = 4 * 7 = 28 of 28 word chars -> 1.0
    assert got[1]["n_tokens"] == 8
    assert abs(got[1]["dup_unigram_frac"] - 0.75) < 1e-9
    assert abs(got[1]["top2gram_char_frac"] - 1.0) < 1e-9
    assert got[1]["repetitive"]

    # doc 2: all distinct, every 2-gram unique -> top cover is the longest
    # gram's chars: "november oscar" = 13
    assert got[2]["dup_unigram_frac"] == 0.0
    chars = sum(len(t) for t in rows[1][1].split())
    assert abs(got[2]["top2gram_char_frac"] - round(13 / chars, 6)) < 1e-9
    assert not got[2]["repetitive"]

    # doc 3: one token -> no 2-grams, no duplication
    assert got[3]["n_tokens"] == 1
    assert got[3]["top2gram_char_frac"] == 0.0
    assert not got[3]["repetitive"]

    # doc 4: empty text -> zeros, not null / not repetitive
    assert got[4]["n_tokens"] == 0
    assert got[4]["dup_unigram_frac"] == 0.0
    assert got[4]["top2gram_char_frac"] == 0.0
    assert not got[4]["repetitive"]

    # doc 5: 10 tokens 1 distinct -> dup 0.9; "x x" covers 9*2/10 chars
    assert abs(got[5]["dup_unigram_frac"] - 0.9) < 1e-9
    assert abs(got[5]["top2gram_char_frac"] - 1.8) < 1e-9
    assert got[5]["repetitive"]


def test_repetition_matches_python_reference(spark, corpus):
    """Engine signals == a dict/Counter reimplementation on real corpus text."""
    import re

    pdf = corpus.files.head(60)
    df = spark.createDataFrame(pdf[["fix_id", "content"]])
    got = {
        r["fix_id"]: r
        for r in repetition_stats(
            df, id_col="fix_id", text_col="content"
        ).collect()
    }
    for row in pdf.itertuples():
        toks = re.findall(r"[a-z0-9]+", row.content.lower())
        n, d = len(toks), len(set(toks))
        dup = round(1.0 - d / n, 6) if n else 0.0
        grams = Counter(zip(toks, toks[1:]))
        cover = max(
            (c * (len(a) + len(b)) for (a, b), c in grams.items()),
            default=0,
        )
        chars = sum(len(t) for t in toks)
        top = round(cover / chars, 6) if chars else 0.0
        r = got[row.fix_id]
        assert r["n_tokens"] == n
        assert abs(r["dup_unigram_frac"] - dup) < 1e-9
        assert abs(r["top2gram_char_frac"] - top) < 1e-9


def test_pii_scrub_planted(spark):
    text = (
        "mail bob.smith+x@corp.example.co or ALICE@SUB.DOMAIN.ORG, "
        "server 192.168.0.1 and 10.0.0.255, call 415-555-0134 now; "
        "not-an-ip 1234.5.6.7 stays, not-a-phone 12-345-6789 stays"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = df.select(
        pii.email_count(F.col("text")).alias("e"),
        pii.ipv4_count(F.col("text")).alias("i"),
        pii.phone_count(F.col("text")).alias("p"),
        pii.scrub_pii(F.col("text")).alias("s"),
    ).collect()[0]
    assert (r["e"], r["i"], r["p"]) == (2, 2, 1)
    s = r["s"]
    assert "<EMAIL>" in s and "<IP>" in s and "<PHONE>" in s
    assert "bob.smith" not in s and "192.168.0.1" not in s
    assert "415-555-0134" not in s
    # \b guards: the malformed lookalikes survive untouched
    assert "1234.5.6.7" in s and "12-345-6789" in s


def test_pii_scrub_clean_text_is_identity(spark):
    df = spark.createDataFrame(
        [(1, "plain words only, no addresses here")],
        "doc_id long, text string",
    )
    r = df.select(pii.scrub_pii(F.col("text")).alias("s")).collect()[0]
    assert r["s"] == "plain words only, no addresses here"


# ---------------------------------------------------------------------------
# hypothesis properties: engine == independent Python references on
# arbitrary text (unicode, punctuation, control chars)
# ---------------------------------------------------------------------------

import re as _re

from hypothesis import given, settings, strategies as st

_SETTINGS = settings(max_examples=8, deadline=None)
_TEXT = st.text(
    st.characters(blacklist_categories=("Cs",)), max_size=120
)


def _py_repetition(text):
    from collections import Counter as _Counter

    toks = _re.findall(r"[a-z0-9]+", text.lower())
    n, d = len(toks), len(set(toks))
    dup = round(1.0 - d / n, 6) if n else 0.0
    grams = _Counter(zip(toks, toks[1:]))
    cover = max(
        (c * (len(a) + len(b)) for (a, b), c in grams.items()), default=0
    )
    chars = sum(len(t) for t in toks)
    top = round(cover / chars, 6) if chars else 0.0
    return n, dup, top


@_SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=20))
def test_repetition_fuzz_vs_python(spark, texts):
    """Spark tokenization note: Spark lower() and Python str.lower() agree
    on the [a-z0-9]+ extraction because the token regex only keeps ASCII."""
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        n, dup, top = _py_repetition(t)
        r = got[i]
        assert (r["n_tokens"], r["dup_unigram_frac"],
                r["top2gram_char_frac"]) == (n, dup, top), (t, tuple(r))


_EMAIL = _re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_IP = _re.compile(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b")
_PHONE = _re.compile(r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b")

_PII_ALPHABET = st.sampled_from(
    list("ab @.-0123456789") + ["@example.com", "10.0.0.", "555-123-4567"]
)


@_SETTINGS
@given(st.lists(st.lists(_PII_ALPHABET, max_size=25).map("".join),
                min_size=1, max_size=20))
def test_pii_fuzz_vs_python(spark, texts):
    """Counts and scrubbed text match Python re on an alphabet dense in
    near-miss PII fragments (partial IPs, bare @, dashed digit runs).

    The alphabet stays ASCII on purpose: Python re's \\b is unicode-aware
    while Java (Spark) and RE2 (the DuckDB oracle) default to ASCII word
    chars -- engine and oracle agree with each other on unicode-adjacent
    digits, but this Python reference would not, so the fuzz pins the
    common ASCII semantics and the cross-engine pair is pinned by the
    pii_scrub oracle itself."""
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            pii.email_count(F.col("text")).alias("e"),
            pii.ipv4_count(F.col("text")).alias("i"),
            pii.phone_count(F.col("text")).alias("p"),
            pii.scrub_pii(F.col("text")).alias("s"),
        ).collect()
    }
    for i, t in enumerate(texts):
        want_s = _PHONE.sub(
            "<PHONE>", _IP.sub("<IP>", _EMAIL.sub("<EMAIL>", t))
        )
        r = got[i]
        assert (r["e"], r["i"], r["p"]) == (
            len(_EMAIL.findall(t)), len(_IP.findall(t)),
            len(_PHONE.findall(t))), t
        assert r["s"] == want_s, (t, r["s"], want_s)
