"""Deterministic sequence packing: placement math, determinism, plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from microdeduplication_spark.operators.packing import (
    pack_sequences,
    pack_shard,
)


def _one_shard_rows(spark, toks_by_id, seq_len=10):
    """Pack docs forced into a single shard (n_shards=1) so the running
    sum is exactly the doc_id-ordered prefix."""
    rows = [(i, " ".join(["w"] * n)) for i, n in toks_by_id]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, seq_len=seq_len, n_shards=1)
    return {r["doc_id"]: r for r in out.collect()}


def test_packing_placement_math(spark):
    # prefix:        0    4        12      12   22
    got = _one_shard_rows(
        spark, [(1, 4), (2, 8), (3, 0), (4, 10), (5, 3)], seq_len=10
    )
    assert (got[1]["tok_start"], got[1]["first_seq"], got[1]["last_seq"]) \
        == (0, 0, 0)
    # doc 2 occupies tokens 4..11 -> straddles windows 0 and 1
    assert (got[2]["tok_start"], got[2]["first_seq"], got[2]["last_seq"]) \
        == (4, 0, 1)
    assert got[2]["split_across"]
    # empty doc: zero-width placement at its offset, never splits
    assert (got[3]["n_toks"], got[3]["tok_start"], got[3]["first_seq"],
            got[3]["last_seq"], got[3]["split_across"]) == (0, 12, 1, 1,
                                                            False)
    # doc 4: tokens 12..21 -> windows 1..2
    assert (got[4]["first_seq"], got[4]["last_seq"]) == (1, 2)
    # doc 5: tokens 22..24 -> window 2 only
    assert (got[5]["first_seq"], got[5]["last_seq"],
            got[5]["split_across"]) == (2, 2, False)


def test_packing_exact_boundary_no_split(spark):
    # doc ending exactly at a window edge must NOT be flagged split
    got = _one_shard_rows(spark, [(1, 10), (2, 10)], seq_len=10)
    assert (got[1]["first_seq"], got[1]["last_seq"]) == (0, 0)
    assert not got[1]["split_across"]
    assert (got[2]["first_seq"], got[2]["last_seq"]) == (1, 1)


def test_packing_partition_invariance(spark):
    """Placement is a pure row function: identical across input layouts."""
    rows = [(i, " ".join(["tok"] * (i % 37))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, pack_sequences(df).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(13)).collect()))
    c = sorted(
        map(tuple, pack_sequences(df.repartition(1).sort(F.rand(5)))
            .collect())
    )
    assert a == b == c


def test_packing_shard_matches_hashlib(spark):
    import hashlib

    rows = [(i,) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long")
    got = df.select(
        "doc_id", pack_shard(F.col("doc_id"), 64).alias("s")
    ).collect()
    for r in got:
        want = int(
            hashlib.md5(f"{r['doc_id']}pack".encode()).hexdigest()[:8], 16
        ) % 64
        assert r["s"] == want


def test_packing_plan_one_exchange_no_join(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = pack_sequences(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_packing_rejects_bad_params(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(df, n_shards=0)


def test_training_corpus_composition(spark):
    """The composed pipeline query: non-degenerate funnel, survivors obey
    every stage's predicate, placement offsets are consistent prefix sums,
    and the whole thing is deterministic across runs."""
    import __spark_entry__ as e
    from microdeduplication_spark.operators.repetition import (
        repetition_stats,
    )

    sf = "/root/testdata/sf0.001"
    out = e.q_training_corpus(spark, sf)
    rows = out.collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_docs = docs.count()
    assert 0 < len(rows) < n_docs  # filters did real work

    # no survivor is repetitive
    flags = {
        r["doc_id"]: r["repetitive"]
        for r in repetition_stats(docs).collect()
    }
    assert not any(flags[r["doc_id"]] for r in rows)

    # per-shard offsets are a consistent doc_id-ordered prefix sum
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in shard_rows:
            assert r["tok_start"] == off
            off += r["n_toks"]

    # determinism: second invocation is byte-identical
    rows2 = e.q_training_corpus(spark, sf).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
