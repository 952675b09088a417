"""Delimited-text sources (reference S2/S3 scans, SURVEY.md §2.1).

The reference reads N-quad text with a custom record delimiter so that one
"record" spans multiple physical lines
(/root/reference/deduplicaiton/.../ConvertionToEntities.java:36-45 sets
textinputformat.record.delimiter) and plain text with hand-set partition
counts (Deduplication.java:31). Spark-first equivalents:

- custom record delimiter -> spark.read.option("lineSep", ...).text(...)
- hand-set partitions -> repartition(n) only when the source is a single
  split; otherwise Catalyst/AQE decide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_records(
    spark: SparkSession,
    path: str,
    record_delimiter: str = "\n",
    min_partitions: int | None = None,
) -> DataFrame:
    """Text file(s) -> one row per `record_delimiter`-separated block.

    Returns a single `value: string` column (empty blocks dropped, like the
    reference's non-empty filters F6)."""
    df = spark.read.option("lineSep", record_delimiter).text(path)
    df = df.where(F.length(F.trim("value")) > 0)
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    return df


def parse_quads(lines: DataFrame, col: str = "value") -> DataFrame:
    """N-quad-ish lines -> (key, subject, predicate, obj).

    Reference quad format `<key> <subject> <predicate> <object> .`
    (processWarcFiles/.../Application.java:32-36); rows that do not split
    into exactly 4 fields are dropped (RDFStatistics.java:39-44, F7)."""
    parts = F.split(F.col(col), ">, <|> <")
    ok = lines.where(F.size(parts) == 4)
    clean = lambda c: F.regexp_replace(c, r"^<|>\s*\.?\s*$", "")  # noqa: E731
    return ok.select(
        clean(F.element_at(parts, 1)).alias("key"),
        clean(F.element_at(parts, 2)).alias("subject"),
        clean(F.element_at(parts, 3)).alias("predicate"),
        clean(F.element_at(parts, 4)).alias("obj"),
    )


def type_statistics(quads: DataFrame) -> DataFrame:
    """Records per type, descending (RDFStatistics.java:59-78 semantics:
    reduceByKey + swap-sort becomes one agg + orderBy)."""
    return (
        quads.where(F.col("predicate").contains("type"))
        .groupBy("obj")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("obj"))
    )
