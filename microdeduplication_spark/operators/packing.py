"""Deterministic sequence packing: documents -> fixed-length LM training
sequences.

No reference counterpart; this is the step after dedup/filter/sample in
an LM data pipeline: concatenate documents and cut the stream every
`seq_len` tokens, so every doc gets a reproducible placement
(shard, token offset, first/last sequence index) before the tokenizer
job materializes the actual windows.

Determinism contract (the same one `operators/sampling.py` uses):
placement is a pure function of the row, never of partition layout or
RNG. Docs are sharded by the md5-32 family (cross-engine exact,
replayed verbatim in the DuckDB oracle) and concatenated in doc_id
order within each shard, so a re-run, a repartition, or an engine swap
yields byte-identical packing -- df.sample-style nondeterminism here
would silently re-shuffle which documents share a training sequence.

Scale design: one exchange (hash on shard), one per-shard sort feeding
a running-sum window -- the standard distributed prefix. Shard count
bounds the window partition (pick ~8x executor count at 100 TB so each
shard's token stream sorts in memory); everything is JVM codegen
(regexp token count, md5/conv shard, one Window node), no Python, no
join, no collect. Empty docs keep a well-defined zero-width placement
instead of a null channel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SEQ_LEN = 512
DEFAULT_N_SHARDS = 64
PACK_SALT = "pack"


def pack_shard(key, n_shards: int = DEFAULT_N_SHARDS, salt: str = PACK_SALT):
    """Deterministic shard in [0, n_shards) from md5-32 of (key, salt).

    DuckDB replay: ('0x' || substr(md5(key || salt), 1, 8))::BIGINT % n."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(n_shards))


def pack_sequences(
    docs: DataFrame,
    seq_len: int = DEFAULT_SEQ_LEN,
    n_shards: int = DEFAULT_N_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple = (),
) -> DataFrame:
    """Per-document placement in the packed token stream.

    Returns (id_col, shard, n_toks, tok_start, first_seq, last_seq,
    split_across): tok_start is the doc's token offset in its shard's
    stream (docs concatenated in id order), first/last_seq are the
    shard-local indices of the seq_len-token windows the doc touches
    ((shard, seq) is the global sequence key), split_across flags docs
    straddling a window boundary. Tokens = whitespace runs, the same
    count `token_stats` reports as ws_tokens. `keep` names extra input
    columns to carry through unchanged (rides the same exchange --
    cheaper than a join back to the input, which would re-execute the
    input's lineage as a fork).
    """
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError(
            f"seq_len and n_shards must be positive, got {seq_len}, "
            f"{n_shards}"
        )
    t = docs.select(
        F.col(id_col),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
        ).cast("long").alias("n_toks"),
        pack_shard(F.col(id_col), n_shards).alias("shard"),
        *[F.col(k) for k in keep],
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "tok_start", F.coalesce(F.sum("n_toks").over(w), F.lit(0))
    )
    first_seq = F.floor(F.col("tok_start") / seq_len)
    last_seq = F.when(
        F.col("n_toks") > 0,
        F.floor((F.col("tok_start") + F.col("n_toks") - 1) / seq_len),
    ).otherwise(first_seq)
    return c.select(
        F.col(id_col),
        "shard",
        "n_toks",
        "tok_start",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        *[F.col(k) for k in keep],
    ).withColumn("split_across", F.col("last_seq") > F.col("first_seq"))
