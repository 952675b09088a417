"""Incremental ingest: stream new files into the normalized/exact-dedup state.

The reference is batch-only (SURVEY.md §2.9) and the production pipeline here
is batch + resumable checkpoints, but a crawl corpus grows continuously; this
module gives the ingest stage a Structured Streaming front:

    readStream(files parquet dir) -> ingest_normalize -> foreachBatch:
        append new rows to the normalized table, keyed idempotently by
        file_id (micro-batch dedup via left_anti against the sink)

The sink is HIVE-PARTITIONED BY KEY BUCKET (key_bucket =
pmod(xxhash64(file_id), n_buckets)): a micro-batch of m files touches at
most m buckets, and the idempotence anti-join reads ONLY those buckets'
partitions (partition pruning on the sink scan -- asserted by plan test).
Per-trigger dedup cost is O(touched_buckets/n_buckets * corpus) instead of
the O(corpus) full-sink rescan -- MERGE-INTO-on-key semantics without
requiring Delta/Iceberg in the container (an Iceberg MERGE is the drop-in
upgrade: same key, same bucketing).

Why foreachBatch and not a stateful streaming agg: exact/near-dup clustering
is a global fixpoint (connected components), not an incremental fold --
recluster runs as the normal batch pipeline over the updated normalized
table. This split (streaming ingest, batch recluster) is the standard lambda
shape for web-scale dedup; the micro-batch sink stays idempotent so replays
are safe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from microdeduplication_spark.config import DedupConfig
from microdeduplication_spark.operators.exact_dedup import ingest_normalize
from microdeduplication_spark.sources.files_source import FILES_SCHEMA


def key_bucket(col, n_buckets: int):
    """The sink's key-bucket partition value for a file_id column."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def read_sink_buckets(spark: SparkSession, sink_dir: str, buckets: list[int]):
    """Sink rows from ONLY the given key buckets -- the filter lands as a
    partition filter on the hive-partitioned sink scan (untouched bucket
    directories are never opened)."""
    return spark.read.parquet(sink_dir).where(
        F.col("key_bucket").isin([int(b) for b in buckets])
    )


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    sink_dir: str,
    cfg: DedupConfig,
    checkpoint_dir: str,
    n_buckets: int = 64,
):
    """Start a streaming query that keeps <sink_dir> (parquet, partitioned by
    key_bucket) up to date with the normalized form of every file dropped
    into <input_dir>.

    Returns the StreamingQuery; callers drive it with processAllAvailable()
    in tests or awaitTermination() in production.
    """

    def _sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # within-batch dedup first: two rows with the same (repo,path,commit)
        # in one micro-batch must land once for the file_id key to be honest
        normalized = (
            ingest_normalize(batch_df, cfg)
            .dropDuplicates(["file_id"])
            .withColumn("key_bucket", key_bucket(F.col("file_id"), n_buckets))
            .localCheckpoint(eager=True)  # read twice: touched set + write
        )
        if os.path.exists(sink_dir):
            # keyed idempotence without a full-sink rescan: collect the
            # touched bucket ids (<= batch size, typically << n_buckets) and
            # anti-join against ONLY those partitions of the sink
            touched = [
                r["key_bucket"]
                for r in normalized.select("key_bucket").distinct().collect()
            ]
            existing = read_sink_buckets(
                batch_df.sparkSession, sink_dir, touched
            ).select("file_id")
            normalized = normalized.join(existing, "file_id", "left_anti")
        normalized.write.mode("append").partitionBy("key_bucket").parquet(sink_dir)

    stream = (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(_sink_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def streaming_dup_counter(spark: SparkSession, input_dir: str, cfg: DedupConfig):
    """Pure streaming aggregation demo: running count of rows per norm_sha
    (complete mode, memory sink 'dup_counts'). Shows watermark-free stateful
    agg on the dedup key; used by tests."""
    stream = (
        spark.readStream.schema(FILES_SCHEMA)
        .parquet(input_dir)
    )
    normalized = ingest_normalize(stream, cfg)
    agg = normalized.groupBy("norm_sha").agg(
        F.count("*").alias("n"), F.min("file_id").alias("rep_id")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("dup_counts")
        .start()
    )
