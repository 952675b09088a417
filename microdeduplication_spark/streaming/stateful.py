"""Custom stateful streaming operator: first-seen dedup over a key.

The reference's cross-window suppression keeps the FIRST record of each
duplicate group (/root/reference/deduplicaiton/.../utils/Util.java:67-120,
single-threaded static state). Batch-side that becomes connected components;
stream-side it is exactly a keyed stateful filter: emit a row iff its key has
never been seen in the stream's lifetime. Implemented with
applyInPandasWithState -- per-key state is one boolean, grouped by the dedup
key, Arrow-batched; no driver state, no cross-partition state, horizontally
partitioned by the shuffle on the key like any streaming aggregation.

Late/duplicate arrivals are suppressed forever (NoTimeout state); a
production deployment at 10^12 keys would bound state with a TTL timeout
(ProcessingTimeTimeout) + the batch reconciliation pass -- the operator shape
is identical, so the knob is documented rather than defaulted.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from microdeduplication_spark.config import DedupConfig
from microdeduplication_spark.operators.exact_dedup import ingest_normalize
from microdeduplication_spark.sources.files_source import FILES_SCHEMA

OUTPUT_SCHEMA = "norm_sha string, file_id long, repo string, path string"
STATE_SCHEMA = "seen boolean"


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = state.exists and state.get[0]
    if seen:
        state.update((True,))
        return iter(())
    # deterministic representative within the batch: min file_id across
    # EVERY Arrow chunk of the group (a group can span multiple pdfs; the
    # smallest id may arrive in a later chunk).
    first = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        cand = pdf.sort_values("file_id").head(1)
        if first is None or cand["file_id"].iloc[0] < first["file_id"].iloc[0]:
            first = cand
    state.update((True,))
    if first is None:
        return iter(())
    return iter([first[["norm_sha", "file_id", "repo", "path"]]])


def streaming_first_seen(
    spark: SparkSession, input_dir: str, cfg: DedupConfig
):
    """Streaming query emitting exactly one row per norm_sha ever seen
    (memory sink 'first_seen', append mode). Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    normalized = ingest_normalize(stream, cfg).select(
        "norm_sha", "file_id", "repo", "path"
    )
    deduped = normalized.groupBy("norm_sha").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("first_seen")
        .start()
    )
