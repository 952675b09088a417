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
