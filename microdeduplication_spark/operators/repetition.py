"""Gopher-style repetition signals for training-data quality filtering.

No reference counterpart; this is the standard repetition family from
Rae et al. 2021 ("Scaling Language Models: ... Gopher", App. A1.1):
documents dominated by a single repeated n-gram or by duplicated tokens
are low-quality for LM training and get filtered before dedup even sees
them. Two signals per document:

  dup_unigram_frac    1 - distinct_tokens / total_tokens
  top2gram_char_frac  chars covered by the most frequent word 2-gram
                      (count * non-space chars of the gram) / total word
                      chars -- Gopher's "fraction of characters in the
                      most common 2-gram" with its 0.20 threshold.

Scale design: ONE scan, ONE content exchange, ZERO joins. posexplode ->
(doc_id, pos, tok), one lead() window partitioned by doc_id (never a
global sort) attaches the 2-gram to each token row, and then a single
two-level aggregation tree computes BOTH signals: level 1 groups
(doc_id, tok, gram) -- a gram determines its first token, so per-gram
counts and per-token occurrences coexist in the same groups -- and
level 2 folds to doc_id with sum/count_distinct/max. Both levels are
satisfied by the window's doc_id partitioning (subset rule), so neither
adds an exchange; there is no fork, hence nothing to re-execute or
checkpoint (the union-fork duplication trap). No HOF lambda touches
token granularity (the Catalyst interpreted-HOF trap measured at
15-100x on decontamination grams) and no Python UDF anywhere. Ties in
the top-gram are irrelevant by construction -- the query maxes the
count*chars PRODUCT, not the gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from microdeduplication_spark.functions.textstats import word_tokens_lower

# Gopher A1.1 filters at 0.20 for top-2-gram char fraction; the unigram
# duplication threshold is ours (word-soup corpora repeat heavily).
TOP2GRAM_CHAR_FRAC_MAX = 0.20
DUP_UNIGRAM_FRAC_MAX = 0.50


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top2gram_max: float = TOP2GRAM_CHAR_FRAC_MAX,
    dup_unigram_max: float = DUP_UNIGRAM_FRAC_MAX,
) -> DataFrame:
    """Per-document repetition signals + a `repetitive` drop flag.

    Returns (id_col, n_tokens, dup_unigram_frac, top2gram_char_frac,
    repetitive); fractions rounded to 6 places for cross-engine equality.
    Docs with 0 tokens score 0.0/0.0; with <2 tokens top2gram is 0.0.

    NOTE (ADVICE r5): top2gram_char_frac can EXCEED 1.0 for
    self-overlapping repeated tokens (doc "a a a a" scores 1.5) because
    each overlapping bigram occurrence counts the full gram characters.
    The value is a coverage *score*, not a true fraction; threshold
    semantics are unaffected (such docs are maximally repetitive and the
    flag fires regardless). Kept unclamped: the oracle replays this exact
    arithmetic, and a clamp would change declared-query output.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode_outer(word_tokens_lower(F.col(text_col))).alias(
            "pos", "tok"
        ),
    )
    # one row PER TOKEN POSITION: its token plus the 2-gram it starts
    # (gram_chars is null on the last token / on empty docs)
    w = Window.partitionBy(id_col).orderBy("pos")
    nxt = F.lead("tok", 1).over(w)
    win = toks.select(
        F.col(id_col),
        F.col("tok"),
        F.concat_ws(" ", "tok", nxt).alias("gram"),
        (F.length("tok") + F.length(nxt)).alias("gram_chars"),
    )
    # level 1: gram -> first token is functional, so cnt is both "times
    # this gram occurs" and "times this token starts this gram"
    lvl1 = win.groupBy(id_col, "tok", "gram", "gram_chars").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # level 2: token totals + top-gram coverage in ONE aggregate; null
    # tok (empty doc) and null gram_chars (last token) drop out of the
    # respective measures naturally
    agg = lvl1.groupBy(id_col).agg(
        F.coalesce(
            F.sum(F.when(F.col("tok").isNotNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_tokens"),
        F.count_distinct("tok").alias("n_distinct"),
        F.coalesce(F.sum(F.col("cnt") * F.length("tok")), F.lit(0)).alias(
            "word_chars"
        ),
        F.max(F.col("cnt") * F.col("gram_chars")).alias("top_cover"),
    )
    dup = F.when(
        F.col("n_tokens") > 0,
        1.0 - F.col("n_distinct") / F.col("n_tokens"),
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        F.col("word_chars") > 0,
        F.coalesce(F.col("top_cover"), F.lit(0)) / F.col("word_chars"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col(id_col),
        "n_tokens",
        F.round(dup, 6).alias("dup_unigram_frac"),
        F.round(top_frac, 6).alias("top2gram_char_frac"),
    ).withColumn(
        "repetitive",
        (F.col("top2gram_char_frac") > F.lit(top2gram_max))
        | (F.col("dup_unigram_frac") > F.lit(dup_unigram_max)),
    )
