"""Benchmark decontamination: drop corpus docs that share token n-grams
with an evaluation set.

No reference counterpart (the reference dedups a corpus against itself);
this is the standard training-data hygiene pass -- any document whose text
contains an n-gram that also appears in a held-out benchmark is flagged so
eval numbers measure generalization, not memorization.

Scale design (100 TB corpus x ~10^5-10^7-gram eval set):
- Gram hashing runs in the vectorized Arrow kernel family
  (functions/hashing.ngram_hash_batch): the pure-Catalyst HOF version
  (transform(sequence(...)) with xxhash64 per element) evaluates
  INTERPRETED and measured 25 s for 5k sf0.1 docs vs ~0.5 s for the Arrow
  kernel -- the same 20x gap that put shingling on Arrow. The kernel's
  tokenizer is the oracle's regex ([A-Za-z0-9_]+ on raw text) and a doc
  with fewer than n tokens emits NO gram (no whole-doc fallback).
- The corpus side explodes to (doc_id, gram_hash) but the explode is
  pipelined into the scan and immediately filtered by a BROADCAST semi/hash
  join against the (distinct, small) eval gram set: non-matching grams die
  map-side, nothing materializes, no corpus-sized shuffle. The only
  exchange is the groupBy(doc_id) over HIT rows -- contamination-sized,
  not corpus-sized.
- If the eval set ever outgrows broadcast range, the same plan degrades
  gracefully to a shuffled hash join on gram_hash (drop the broadcast
  hint); semantics unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ngram_hash_sets(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, grams: array<long>) -- distinct hashed token n-grams per doc.

    Docs with fewer than n tokens have no n-gram (empty array), matching
    the SQL-oracle semantics. Arrow kernel, not Catalyst HOFs -- see the
    module docstring for the measured 20x."""
    from microdeduplication_spark.functions.hashing import make_ngram_udf

    return df.select(
        id_col, make_ngram_udf(n)(F.col(text_col)).alias("grams")
    )


def contamination_hits(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
) -> DataFrame:
    """(id, n_hit) for every corpus doc sharing >=1 token n-gram with the
    eval set; n_hit counts its DISTINCT shared n-grams."""
    eval_grams = (
        ngram_hash_sets(
            eval_df.select(F.lit(0).alias("_eid"),
                           F.col(eval_text_col or text_col).alias("text")),
            n, id_col="_eid", text_col="text",
        )
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    doc_grams = ngram_hash_sets(docs, n, id_col, text_col).select(
        id_col, F.explode("grams").alias("g")
    )
    return (
        doc_grams.join(F.broadcast(eval_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )


def contamination_hits_within(
    docs: DataFrame,
    eval_pred,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """contamination_hits when the eval set IS a corpus slice (a holdout
    split): one gram scan feeds both join sides via a lazy localCheckpoint
    (a union/join fork of filtered branches re-executes the upstream scan
    per branch otherwise -- the Arrow kernel would run twice)."""
    from microdeduplication_spark.functions.hashing import make_ngram_udf

    grams = docs.select(
        id_col,
        eval_pred.alias("_is_eval"),
        make_ngram_udf(n)(F.col(text_col)).alias("grams"),
    ).localCheckpoint(eager=False)
    eval_grams = (
        grams.where("_is_eval").select(F.explode("grams").alias("g")).distinct()
    )
    doc_grams = grams.select(id_col, F.explode("grams").alias("g"))
    return (
        doc_grams.join(F.broadcast(eval_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
) -> DataFrame:
    """Corpus minus contaminated docs (left_anti on the hit ids)."""
    hits = contamination_hits(
        docs, eval_df, n, id_col, text_col, eval_text_col
    ).select(id_col)
    return docs.join(hits, id_col, "left_anti")
