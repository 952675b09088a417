"""Incremental ingest: stream new files into the normalized/exact-dedup state.

The reference is batch-only (SURVEY.md §2.9) and the production pipeline here
is batch + resumable checkpoints, but a crawl corpus grows continuously; this
module gives the ingest stage a Structured Streaming front:

    readStream(files parquet dir) -> ingest_normalize -> foreachBatch:
        append new rows to the normalized table, keyed idempotently by
        file_id (micro-batch dedup via left_anti against the sink)

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


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    sink_dir: str,
    cfg: DedupConfig,
    checkpoint_dir: str,
):
    """Start a streaming query that keeps <sink_dir> (parquet) up to date with
    the normalized form of every file dropped into <input_dir>.

    Returns the StreamingQuery; callers drive it with processAllAvailable()
    in tests or awaitTermination() in production.
    """

    def _sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # within-batch dedup first: two rows with the same (repo,path,commit)
        # in one micro-batch must land once for the file_id key to be honest
        normalized = ingest_normalize(batch_df, cfg).dropDuplicates(["file_id"])
        if os.path.exists(sink_dir):
            # NOTE: this left_anti re-reads the whole sink each micro-batch --
            # O(corpus) per trigger. Fine for a parquet sink at test scale; at
            # production scale the sink must be a keyed table (Iceberg/Delta
            # MERGE INTO on file_id) so the dedup is an index lookup, not a scan.
            existing = batch_df.sparkSession.read.parquet(sink_dir).select("file_id")
            normalized = normalized.join(existing, "file_id", "left_anti")
        normalized.write.mode("append").parquet(sink_dir)

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
