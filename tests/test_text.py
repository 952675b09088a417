"""Spark text functions vs their pure-Python mirrors + hashlib sha256 oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from microdeduplication_spark.functions import text as tx


SAMPLES = [
    "def f(x):\n    return x + 1\n",
    "a\r\nb\r\rc",
    "  lots\t\tof   space \n\n\n and blank  lines \n",
    "",
    "one_token",
    "tab\tsep\tvals\nsecond line here now ok",
    "unicode: päälk äöü ሴ end",
]


def test_normalize_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["content"])
    got = [
        r["norm"]
        for r in df.select(tx.normalize_content(F.col("content")).alias("norm"))
        .collect()
    ]
    want = [tx.normalize_py(s) for s in SAMPLES]
    assert got == want


def test_sha256_matches_hashlib(spark, corpus):
    """Per-row invariant (BASELINE.json input_hint): Spark sha2 == hashlib."""
    pdf = corpus.files.head(50)
    df = spark.createDataFrame(pdf[["content"]])
    got = [
        r["sha"]
        for r in df.select(tx.content_sha256(F.col("content")).alias("sha")).collect()
    ]
    want = [tx.sha256_py(c) for c in pdf["content"]]
    assert got == want


def test_tokens_match_python(spark):
    df = spark.createDataFrame([(tx.normalize_py(s),) for s in SAMPLES], ["norm"])
    got = [r["t"] for r in df.select(tx.tokens(F.col("norm")).alias("t")).collect()]
    want = [tx.tokens_py(tx.normalize_py(s)) for s in SAMPLES]
    assert got == want


def test_shingle_counts_match_python(spark, cfg):
    """Hashed shingle sets must be the same size as string shingle sets
    (xxhash64 collisions at n<10^6: ~0)."""
    samples = [s for s in SAMPLES if tx.tokens_py(tx.normalize_py(s))]
    df = spark.createDataFrame([(tx.normalize_py(s),) for s in samples], ["norm"])
    got = (
        df.select(
            F.size(
                tx.shingle_hashes(tx.tokens(F.col("norm")), cfg.shingle_k)
            ).alias("n")
        )
        .collect()
    )
    want = [len(tx.shingles_py(tx.normalize_py(s), cfg.shingle_k)) for s in samples]
    assert [r["n"] for r in got] == want


def test_jaccard_of_hashed_equals_jaccard_of_strings(spark, cfg, corpus):
    """Exact Jaccard on xxhash64 shingle arrays == Jaccard on string shingles."""
    pdf = corpus.files.head(40)
    df = spark.createDataFrame(pdf[["fix_id", "content"]])
    sh = df.select(
        "fix_id",
        tx.shingle_hashes(
            tx.tokens(tx.normalize_content(F.col("content"))), cfg.shingle_k
        ).alias("sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    union = F.size("a.sh") + F.size("b.sh") - inter
    pairs = (
        a.join(b, F.col("a.fix_id") < F.col("b.fix_id"))
        .select(
            F.col("a.fix_id").alias("ai"),
            F.col("b.fix_id").alias("bi"),
            (inter / union).alias("j"),
        )
        .collect()
    )
    by_fix = {int(r.fix_id): tx.shingles_py(tx.normalize_py(r.content), cfg.shingle_k)
              for r in pdf.itertuples()}
    for r in pairs:
        want = tx.jaccard_py(by_fix[r["ai"]], by_fix[r["bi"]])
        assert abs(r["j"] - want) < 1e-12
