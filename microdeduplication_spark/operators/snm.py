"""Sorted-Neighborhood-Method operators (reference-parity surface).

The reference's core blocking strategy is SNM: blocking-key projection
(/root/reference/deduplicaiton/.../processes/Deduplication.java:64-95), a
global sortByKey (:97), and an mllib sliding window of w records (:103-104)
whose pairs feed the match predicates. The new engine's production blocking
is LSH (operators/minhash_lsh.py) -- see SURVEY.md §2.6 W1/W2 for why SNM
does not survive at 10^12 files -- but the SNM *semantics* (compare each
record to its w-1 successors in key order) remain available here as a window
function, for parity checks and for workloads where a domain sort key exists.

Spark-first: no global sort + no sliding RDD. `lead()` over a window gives
each record its successors; partitioning by a coarse key prefix bounds the
sort (the reference's single total sort becomes range-partitioned local
sorts). The reference's stateful cross-window suppression (Util.java:67-120)
is NOT reproduced -- dedup group formation belongs to connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def snm_candidate_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 3,
    partition_col: str | None = None,
) -> DataFrame:
    """All (a_id, b_id) pairs within `window` positions in key order.

    Matches the pair-enumeration semantics of the reference's sliding window
    incl. its suffix-tail behavior (Deduplication.java:108-125): every record
    is compared to each of its w-1 successors, with the tail windows emitting
    their remaining suffix pairs.

    partition_col bounds the sort scope (scalable path); None reproduces the
    reference's single global ordering (small data / parity tests only).
    """
    w = (
        W.partitionBy(partition_col) if partition_col else W.partitionBy(F.lit(1))
    ).orderBy(F.col(key_col), F.col(id_col))
    out = None
    for off in range(1, window):
        nxt = df.select(
            F.col(id_col).alias("a_id"),
            F.col(key_col).alias("a_key"),
            F.lead(F.col(id_col), off).over(w).alias("b_id"),
            F.lead(F.col(key_col), off).over(w).alias("b_key"),
        ).where(F.col("b_id").isNotNull())
        out = nxt if out is None else out.unionByName(nxt)
    return out.select(
        F.least("a_id", "b_id").alias("a_id"),
        F.greatest("a_id", "b_id").alias("b_id"),
        "a_key",
        "b_key",
    ).distinct()
