"""Ingest + normalize + exact dedup (build-plan step 2, SURVEY.md §7).

Replaces the reference's within-document LinkedHashSet dedup
(/root/reference/processWarcFiles/.../MicroDataExtraction.java:206-215) and the
SNM exact-equality match (Product.equals,
/root/reference/deduplicaiton/.../models/Product.java:92-112) with a corpus-wide
groupBy on content hash.

Scale notes (100 TB):
- file_id = xxhash64(repo,path,commit): computed at scan time, no shuffle.
- exact dedup groups by the *normalized*-content sha (norm_sha), which strictly
  subsumes raw-byte equality; the raw content_sha256 column is kept as the
  per-row invariant vs the reference (BASELINE.json input_hint).
- every downstream near-dup stage runs on one representative per norm_sha
  group, so exact-duplicate skew (the planted hot cluster; at web scale,
  vendored files duplicated millions of times) NEVER reaches the LSH joins --
  a hot sha group collapses to a single row before any signature is computed.
- the groupBy is a partial-aggregate (map-side combine) shuffle on norm_sha:
  one shuffle, key cardinality ~= number of distinct contents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from microdeduplication_spark.config import DedupConfig
from microdeduplication_spark.functions.text import content_sha256, normalize_content


def ingest_normalize(files: DataFrame, cfg: DedupConfig) -> DataFrame:
    """files(repo,path,commit,lang,content) -> normalized table.

    Output: file_id, repo, path, commit, lang, content_norm, content_sha256,
    norm_sha, n_chars. Drops rows with null/empty content (the reference's
    validity filter, Deduplication.java:44-61, becomes Column predicates --
    SURVEY.md F5).
    """
    return (
        files.where(F.col("content").isNotNull() & (F.length("content") > 0))
        .select(
            F.xxhash64("repo", "path", "commit").alias("file_id"),
            "repo",
            "path",
            "commit",
            "lang",
            content_sha256(F.col("content")).alias("content_sha256"),
            normalize_content(F.col("content")).alias("content_norm"),
            F.length("content").alias("n_chars"),
        )
        .withColumn("norm_sha", content_sha256(F.col("content_norm")))
    )


def exact_groups(normalized: DataFrame) -> DataFrame:
    """(norm_sha, rep_id=min file_id, group_size) -- one row per distinct content."""
    return normalized.groupBy("norm_sha").agg(
        F.min("file_id").alias("rep_id"), F.count("*").alias("group_size")
    )


def exact_edges(normalized: DataFrame, groups: DataFrame) -> DataFrame:
    """Star edges (file_id -> rep_id) for every non-singleton exact group.

    Spanning stars, not all-pairs: a group of n exact duplicates contributes
    n-1 edges, so the hot cluster stays linear. Connectivity (hence the final
    cluster assignment) is identical to all-pairs.
    """
    return (
        normalized.join(groups.where(F.col("group_size") > 1), "norm_sha")
        .where(F.col("file_id") != F.col("rep_id"))
        .select(F.col("rep_id").alias("src"), F.col("file_id").alias("dst"))
    )


def representatives(normalized: DataFrame, groups: DataFrame) -> DataFrame:
    """One row per distinct normalized content: the near-dup stages' input.

    left_semi join on (file_id == rep_id): no data duplication, and the big
    `content_norm` strings of non-representatives never travel further.
    """
    reps = groups.select(F.col("rep_id").alias("file_id"))
    return normalized.join(reps, "file_id", "left_semi").select(
        "file_id", "lang", "content_norm"
    )
