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
