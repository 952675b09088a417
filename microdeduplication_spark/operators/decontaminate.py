"""Benchmark decontamination: drop corpus docs that share token n-grams
with an evaluation set.

No reference counterpart (the reference dedups a corpus against itself);
this is the standard training-data hygiene pass -- any document whose text
contains an n-gram that also appears in a held-out benchmark is flagged so
eval numbers measure generalization, not memorization.

Scale design (100 TB corpus x ~10^5-10^7-gram eval set):
- Pure JVM expressions end to end: tokens via split(), n-gram strings via
  transform(sequence(...)) over a MATERIALIZED token column (HOF lambdas
  re-evaluate non-attribute outer expressions per element -- the two-step
  select is the same performance contract as functions/text.shingle_hashes),
  xxhash64 per gram. No Python touches the corpus scan.
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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from microdeduplication_spark.functions.text import tokens


def _gram_hashes(toks: Column, n: int) -> Column:
    """array<long> of xxhash64 over space-joined token n-grams (distinct).

    `toks` must be a MATERIALIZED token-array column (an attribute), not an
    inline expression -- see module docstring."""
    # guard, don't clamp: sequence(1, 0) yields a DESCENDING [1, 0], so a
    # sub-n-token doc would emit spurious whole-doc "grams"
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))),
            )
        ),
    ).otherwise(F.expr("array()").cast("array<long>"))


def ngram_hash_sets(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, grams: array<long>) -- distinct hashed token n-grams per doc.

    Docs with fewer than n tokens have no n-gram (empty array), matching
    the SQL-oracle semantics."""
    toks = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    )
    return toks.select(
        F.col("_id").alias(id_col), _gram_hashes(F.col("_toks"), n).alias("grams")
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
