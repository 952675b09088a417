"""Incremental-dedup cost evidence: increment a batch against an index vs
re-running the one-shot pipeline on the full corpus.

The module's value proposition at 100 TB is that a daily drop costs
O(batch), not O(corpus): old content is never re-read, batch<->index joins
are equi-joins on band keys with the batch side broadcast. This measures
that on the driver bench's own 50k-file corpus (sf0.1) with a 90/10
corpus/batch split, printing one JSON line:

    {"n_corpus": ..., "n_batch": ..., "one_shot_sec": ...,
     "increment_sec": ..., "speedup": ..., "partition_equal": true}

Usage: PYTHONPATH=/root/repo python tools/incremental_bench.py \
           [sf_dir] [cpus] [batch_mod]
batch_mod M puts ~1/M of the corpus in the batch (default 10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    batch_mod = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    import bench
    from microdeduplication_spark.config import DedupConfig
    from microdeduplication_spark.operators.incremental_dedup import (
        dedup_increment,
        init_index,
        read_clusters,
    )
    from microdeduplication_spark.pipeline import run_pipeline
    from microdeduplication_spark.session import build_session
    from microdeduplication_spark.sources.files_source import read_files

    corpus_path = bench.ensure_bench_corpus(bench._sf_of(sf_dir))
    spark = build_session(cores=cpus)
    cfg = DedupConfig()
    files = read_files(spark, parquet_path=corpus_path).repartition(
        spark.sparkContext.defaultParallelism
    )
    batch_pred = F.xxhash64("path") % batch_mod == 0
    corpus, batch = files.where(~batch_pred), files.where(batch_pred)
    n_corpus, n_batch = corpus.count(), batch.count()

    idx = tempfile.mkdtemp(prefix="incr_bench_idx_")
    try:
        init_index(spark, corpus, cfg, idx)  # index build = warmup + state

        t0 = time.monotonic()
        res = run_pipeline(spark, files, cfg)
        res.clusters.count()
        one_shot = time.monotonic() - t0

        t0 = time.monotonic()
        dedup_increment(spark, batch, cfg, idx)
        increment = time.monotonic() - t0

        def part(pairs):
            by: dict[int, set[int]] = {}
            for fid, cid in pairs:
                by.setdefault(cid, set()).add(fid)
            return {frozenset(v) for v in by.values()}

        full = part((r.file_id, r.cluster_id)
                    for r in res.clusters.collect())
        inc = part((r.file_id, r.cluster_id)
                   for r in read_clusters(spark, idx).collect())

        print(json.dumps({
            "corpus": os.path.basename(corpus_path), "cpus": cpus,
            "n_corpus": n_corpus, "n_batch": n_batch,
            "one_shot_sec": round(one_shot, 2),
            "increment_sec": round(increment, 2),
            "speedup": round(one_shot / increment, 2),
            "partition_equal": full == inc,
        }), flush=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
