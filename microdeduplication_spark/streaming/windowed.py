"""Event-time windowed ingest statistics with late-data handling.

The batch pipeline's statistics (per-lang counts, distinct-content counts)
re-expressed over an unbounded crawl stream: tumbling event-time windows
with a watermark bound late arrivals, so state is finite and windows
finalize exactly once (append mode). approx_count_distinct keeps the
distinct-content cardinality a sketch, not a set -- the streaming analog of
the batch job's exact groupBy(norm_sha) at a bounded state cost.

Rows later than the watermark are DROPPED by the engine (the documented
trade: a crawl record arriving `watermark` behind the stream's max event
time no longer updates its window). The batch reconciliation pass
(pipeline.run_pipeline over the full table) remains the source of truth;
this stream gives the online view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_ingest_stats(
    stream: DataFrame,
    event_time_col: str = "event_time",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming DataFrame (with an event-time column and the normalized
    ingest columns) -> per-(window, lang) file counts + approximate distinct
    content counts. Append-mode compatible: the watermark finalizes windows.
    """
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), window), F.col("lang"))
        .agg(
            F.count("*").alias("n_files"),
            F.approx_count_distinct("norm_sha").alias("approx_distinct"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "lang",
            "n_files",
            "approx_distinct",
        )
    )
