"""Production job entry (jobs/run_dedup.py) end-to-end on a tiny corpus."""

from __future__ import annotations

import json
import sys


def test_run_dedup_job(spark, tmp_path):
    sys.path.insert(0, "/root/repo/jobs")
    import run_dedup

    rows = [("r", f"f{i}.py", f"c{i}", "python",
             f"x_{i} = {i}\ny_{i} = {i*3}\nz = pack(x_{i}, y_{i})")
            for i in range(12)]
    rows.append(("r", "dup.py", "cd", "python", rows[0][4]))
    rows.append(("r", "other.go", "cg", "go", "package main"))
    src = str(tmp_path / "files")
    spark.createDataFrame(
        rows, ["repo", "path", "commit", "lang", "content"]
    ).write.parquet(src)

    out = str(tmp_path / "out")
    rc = run_dedup.main(
        ["--input", src, "--output", out,
         "--checkpoint-dir", str(tmp_path / "ck"),
         "--passes", "minhash", "--langs", "python"]
    )
    assert rc == 0
    clusters = spark.read.parquet(f"{out}/clusters")
    assert clusters.count() == 13  # go file filtered at scan
    m = json.loads((tmp_path / "out" / "metrics.json").read_text())
    assert m["summary"]["duplicates"] >= 1  # the planted exact dup merged
    assert m["summary"]["files"] == 13
    assert any(s["stage"] == "clusters" for s in m["stages"])


def test_run_media_job(spark, tmp_path):
    """jobs/run_media.py end-to-end: real decode features, byte-dedup,
    resize sink, frame plan, metrics manifest."""
    sys.path.insert(0, "/root/repo/jobs")
    import run_media

    from microdeduplication_spark.operators.multimodal import synth_media

    src = str(tmp_path / "media")
    synth_media(spark, n=18, seed=42, real_payloads=True).write.parquet(src)

    out = str(tmp_path / "out")
    rc = run_media.main(
        ["--input", src, "--output", out, "--dim", "8", "--resize", "8x6"]
    )
    assert rc == 0
    feats = spark.read.parquet(f"{out}/features")
    assert feats.count() == 18
    assert {f.name for f in feats.schema} >= {
        "media_id", "kind", "feat_dim", "features", "payload_sha256"
    }
    dedup = spark.read.parquet(f"{out}/dedup")
    assert dedup.agg({"group_size": "sum"}).collect()[0][0] == 18
    assert dedup.where("group_size > 1").count() >= 1  # planted dups
    resized = spark.read.parquet(f"{out}/resized")
    assert resized.count() == 6  # the image rows (18 / 3 kinds)
    assert set(
        (r["width"], r["height"]) for r in resized.collect()
    ) == {(8, 6)}
    frames = spark.read.parquet(f"{out}/frame_plan")
    assert frames.count() > 0
    m = json.loads((tmp_path / "out" / "metrics.json").read_text())
    assert m["features_rows"] == 18 and m["resized_rows"] == 6
