"""Benchmark decontamination: n-gram overlap flagging vs an eval set."""

from __future__ import annotations

from pyspark.sql import functions as F

from microdeduplication_spark.operators.decontaminate import (
    contamination_hits,
    decontaminate,
    ngram_hash_sets,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_flags_shared_ngrams_only(spark):
    ev = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog tonight",)],
        "text string",
    )
    docs = _df(spark, [
        # contains the eval 5-gram "quick brown fox jumps over"
        (1, "intro: the quick brown fox jumps over a fence"),
        (2, "completely unrelated text about spark shuffles and joins"),
        # shares words but no 5-gram run
        (3, "the quick dog jumps over brown fox text lazy"),
    ])
    hits = {r.doc_id: r.n_hit
            for r in contamination_hits(docs, ev, n=5).collect()}
    assert set(hits) == {1}
    assert hits[1] == 2  # "the quick brown fox jumps", "quick brown fox jumps over"

    clean = decontaminate(docs, ev, n=5)
    assert {r.doc_id for r in clean.collect()} == {2, 3}


def test_sub_n_docs_emit_no_grams(spark):
    """A doc with fewer than n tokens must emit NO gram -- the Arrow kernel
    must not inherit shingles_batch's whole-doc fallback, and the Catalyst
    alternative (sequence(1, 0) descends!) would emit spurious grams."""
    docs = _df(spark, [(1, "only three tokens"), (2, "a b c d e")])
    g = {r.doc_id: r.grams for r in ngram_hash_sets(docs, n=5).collect()}
    assert g[1] == []
    assert len(g[2]) == 1

    # a 3-token doc vs a 3-token eval set shares text but has NO 5-gram
    ev = spark.createDataFrame([("only three tokens",)], "text string")
    assert contamination_hits(docs, ev, n=5).count() == 0


def test_n_hit_counts_distinct_shared_grams(spark):
    """Repeated occurrences of the same gram count once on both sides."""
    ev = spark.createDataFrame([("x y z x y z",)], "text string")
    docs = _df(spark, [(7, "x y z x y z x y z")])
    rows = contamination_hits(docs, ev, n=3).collect()
    # doc grams: {x y z, y z x, z x y} ; eval grams: the same set
    assert rows[0].n_hit == 3


def test_eval_join_is_broadcast_no_corpus_shuffle_before_filter(spark):
    """The eval-gram join must be a broadcast hash join: the corpus gram
    explode is filtered map-side, never exchanged on the gram key."""
    ev = spark.createDataFrame([("a b c d e f",)], "text string")
    docs = _df(spark, [(1, "a b c d e f g h")])
    plan = contamination_hits(docs, ev, n=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_within_variant_matches_two_table(spark):
    """contamination_hits_within(docs, pred) == contamination_hits(docs,
    docs.where(pred)) -- the shared-scan fork changes the plan, never the
    answer."""
    from microdeduplication_spark.operators.decontaminate import (
        contamination_hits_within,
    )

    docs = _df(spark, [
        (i, f"common prefix words here {i} alpha beta gamma delta epsilon")
        for i in range(20)
    ])
    pred = F.col("doc_id") % 7 == 0
    two = {(r.doc_id, r.n_hit) for r in contamination_hits(
        docs, docs.where(pred).select("text"), n=5).collect()}
    within = {(r.doc_id, r.n_hit) for r in contamination_hits_within(
        docs, pred, n=5).collect()}
    assert within == two and len(within) > 0
