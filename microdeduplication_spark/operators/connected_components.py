"""Connected components via alternating large-star / small-star joins.

Replaces the reference's cross-window duplicate-suppression scan -- a
static ArrayList threaded through sequential window comparisons
(/root/reference/deduplicaiton/.../utils/Util.java:67-120, state at :17-18),
which is only correct single-threaded -- with the distributed
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 -- public literature). The final cluster id is
min(file_id) over the component, matching the reference's "first record of
the group is the representative" semantics (Util.java:84-99) under the
deterministic file_id order.

Implementation is pure DataFrame joins + aggregations (no collect_list: hot
star centers would blow a list aggregate; min-per-key + join keeps every
operator streaming). Each round:

    large-star: for every node u in the bidirected edge list, connect all
                strictly-greater neighbors to m = min(N(u) u {u})
    small-star: orient edges (max,min); connect all neighbors and u itself
                to the minimum neighbor

Rounds run until the edge multiset hash is stable; convergence is
O(log^2 n) rounds w.h.p. localCheckpoint() truncates lineage each round
(SURVEY.md §7 "hard parts": CC convergence/lineage blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dedup(edges: DataFrame) -> DataFrame:
    return edges.where(F.col("src") != F.col("dst")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    bidir = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = (
        bidir.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least(F.col("mn"), F.col("src")).alias("m"))
    )
    return (
        bidir.where(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    neighbor_edges = (
        oriented.join(mins, "src")
        .where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edges = mins.select(F.col("src"), F.col("m").alias("dst"))
    return neighbor_edges.unionByName(self_edges)


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # bit_xor (not sum): overflow-free under ANSI mode; edges are distinct so
    # xor cancellation cannot produce false convergence
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """edges(src,dst) -> assignments(file_id, cluster_id = component min).

    Nodes that appear in no edge are absent from the output; the caller joins
    against the full node list and coalesces to self (pipeline.py).
    """
    cur = _dedup(
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    ).localCheckpoint()
    prev_fp = None
    for _ in range(max_iter):
        cur = _dedup(_small_star(_large_star(cur))).localCheckpoint()
        fp = _fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    # converged state: small-star output is (node -> component min) stars
    assign = cur.select(
        F.col("src").alias("file_id"), F.col("dst").alias("cluster_id")
    ).unionByName(
        # component minima assign to themselves
        cur.select(F.col("dst").alias("file_id"), F.col("dst").alias("cluster_id"))
    )
    return assign.groupBy("file_id").agg(F.min("cluster_id").alias("cluster_id"))
