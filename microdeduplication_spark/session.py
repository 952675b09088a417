"""SparkSession factory tuned for the dedup pipeline.

Local-mode testing stands in for the multi-executor cluster (BASELINE.md):
the same builder is used at two parallelism levels for the scaling-efficiency
benchmark. All scale-sensitive settings (AQE, skew join, shuffle partitions,
Arrow batching) are centralized here so tests/bench/spark-submit agree.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "microdeduplication-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a SparkSession.

    cores=None uses local[*]; otherwise local[cores]. On a real cluster this
    module is bypassed entirely (spark-submit provides the session) -- every
    pipeline function takes the session as an argument and never calls
    getOrCreate itself.
    """
    cores = cores or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or max(int(cores), 4)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # content strings can be large; keep Arrow batches bounded so a
        # pandas_udf batch of big files does not blow executor memory
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # batch-throughput GC: ParallelGC cut measured total CPU by ~20% vs
        # the G1 default on the dedup pipeline (one shared heap in local mode)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        # single-host shuffle goes through the page cache; lz4 is pure CPU
        # overhead here. A network-shuffling cluster keeps compression ON --
        # this module is explicitly the local stand-in (see docstring).
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
