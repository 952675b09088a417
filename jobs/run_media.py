"""Production entry point: spark-submit --py-files microdeduplication_spark.zip \\
       jobs/run_media.py --input <media-parquet-or-table> --output <dir> \\
       [--dim 64] [--resize WxH] [--frame-every-ms 1000] [--strict]

Runs the multimodal pipeline over a media(media_id, kind, mime, width,
height, duration_ms, payload) table and writes:
    <output>/features/      (media_id, kind, feat_dim, features, payload_sha256)
    <output>/dedup/         exact byte-dedup groups (payload_sha256, rep_id, group_size)
    <output>/resized/       canonical-PNG resized image rows (with --resize)
    <output>/frame_plan/    (media_id, frame_ts_ms) video frame-sample plan
    <output>/metrics.json   row counts per sink

Decode kernels: WAV / PNG / baseline-JPEG / MP4-container are real
in-container; default posture skips/fakes malformed payloads so one corrupt
file cannot fail a 100TB job (--strict propagates codec errors instead).
Like run_dedup.py, the session comes from spark-submit; this job only
composes DataFrames.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="parquet path or catalog table (prefix table:)")
    p.add_argument("--output", required=True)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--resize", default=None, metavar="WxH",
                   help="also write nearest-neighbor-resized image rows")
    p.add_argument("--frame-every-ms", type=int, default=1000)
    p.add_argument("--strict", action="store_true",
                   help="propagate codec errors instead of fake-fallback")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from microdeduplication_spark.operators.multimodal import (
        extract_features,
        frame_sample_plan,
        media_exact_dedup,
        resize_images,
    )

    spark = SparkSession.builder.appName("microdeduplication-media").getOrCreate()

    if args.input.startswith("table:"):
        media = spark.read.table(args.input[len("table:"):])
    else:
        media = spark.read.parquet(args.input)

    metrics: dict[str, int] = {}

    feats = extract_features(
        media, dim=args.dim, deterministic_fake=False,
        fallback_fake=not args.strict,
    )
    feats.write.mode("overwrite").parquet(f"{args.output}/features")
    metrics["features_rows"] = spark.read.parquet(
        f"{args.output}/features"
    ).count()

    dedup = media_exact_dedup(media)
    dedup.write.mode("overwrite").parquet(f"{args.output}/dedup")
    metrics["dedup_groups"] = spark.read.parquet(
        f"{args.output}/dedup"
    ).count()

    if args.resize:
        w, h = (int(x) for x in args.resize.lower().split("x"))
        resize_images(
            media, w, h, skip_malformed=not args.strict
        ).write.mode("overwrite").parquet(f"{args.output}/resized")
        metrics["resized_rows"] = spark.read.parquet(
            f"{args.output}/resized"
        ).count()

    frames = frame_sample_plan(media, every_ms=args.frame_every_ms)
    frames.write.mode("overwrite").parquet(f"{args.output}/frame_plan")
    metrics["frame_plan_rows"] = spark.read.parquet(
        f"{args.output}/frame_plan"
    ).count()

    with open(f"{args.output}/metrics.json", "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
