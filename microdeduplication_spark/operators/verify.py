"""Exact-Jaccard verification of candidate pairs (build-plan step 4).

Replaces the reference's per-pair verification predicates -- Product.equals
(name AND provider-domain AND price,
/root/reference/deduplicaiton/.../models/Product.java:92-112) and
Product.compare's cosine thresholds (Product.java:114-140,
CosineSimilarity.java:28-56) -- with exact Jaccard over the precomputed
distinct shingle-hash sets:

    J(a,b) = |Sa cap Sb| / (|Sa| + |Sb| - |Sa cap Sb|)

computed with JVM-side array_intersect on sorted distinct arrays: no Python,
no recomputation of the sets per pair (the reference recomputes its tf maps
for every window comparison).

Scale notes: the two id->shingles joins are the widest shuffles of the
pipeline (candidate count x shingle-array payload). Candidates are
repartitioned on the join key and the shingle table is reused for both sides;
at a 1000-executor scale the shingle table would be bucketed by file_id so
both joins co-locate without a shuffle (df.write.bucketBy -- documented here,
exercised in local mode via AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from microdeduplication_spark.config import DedupConfig


def verify_jaccard(
    candidates: DataFrame, shingled: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(a_id,b_id,method) x (file_id,shingles) -> pairs with jaccard >= threshold.

    Output: (a_id, b_id, method, score). Candidates from multiple blocking
    methods should be distinct-ed on (a_id,b_id) before calling to avoid
    verifying a pair twice.
    """
    sets_a = shingled.select(
        F.col("file_id").alias("a_id"), F.col("shingles").alias("a_sh")
    )
    sets_b = shingled.select(
        F.col("file_id").alias("b_id"), F.col("shingles").alias("b_sh")
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size("a_sh") + F.size("b_sh") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        candidates.join(sets_a, "a_id")
        .join(sets_b, "b_id")
        .withColumn("score", jac)
        .where(F.col("score") >= F.lit(cfg.jaccard_threshold))
        .select("a_id", "b_id", "method", "score")
    )
