"""Text sources: custom record delimiter, quad parsing, type statistics."""

from __future__ import annotations

from microdeduplication_spark.sources.text_source import (
    parse_quads,
    read_records,
    type_statistics,
)


def test_custom_delimiter_blocks(spark, tmp_path):
    p = tmp_path / "blocks.txt"
    p.write_text("block one\nline two|||block two\nmore|||  |||block three")
    df = read_records(spark, str(p), record_delimiter="|||")
    vals = sorted(r["value"] for r in df.collect())
    assert vals == ["block one\nline two", "block three", "block two\nmore"]


def test_parse_quads_and_stats(spark, tmp_path):
    lines = [
        "<k1> <s1> <rdf-syntax-ns#type> <schema.org/Product> .",
        "<k1> <s1> <schema.org/name> <Widget> .",
        "<k2> <s2> <rdf-syntax-ns#type> <schema.org/Product> .",
        "<k3> <s3> <rdf-syntax-ns#type> <schema.org/Offer> .",
        "malformed line without fields",
    ]
    p = tmp_path / "quads.nq"
    p.write_text("\n".join(lines))
    quads = parse_quads(read_records(spark, str(p)))
    assert quads.count() == 4  # malformed dropped
    stats = type_statistics(quads).collect()
    assert [(r["obj"], r["n"]) for r in stats] == [
        ("schema.org/Product", 2),
        ("schema.org/Offer", 1),
    ]


def test_eager_persist_mode_equals_lazy(spark, cfg):
    from microdeduplication_spark.pipeline import run_pipeline

    rows = [("r", f"f{i}.py", f"c{i}", "python",
             f"a = {i}\nb = {i*2}\nc = join(a, b)") for i in range(20)]
    rows += [rows[0][:1] + ("dup.py", "cx", "python", rows[0][4])]
    df = spark.createDataFrame(rows, ["repo", "path", "commit", "lang", "content"])
    lazy = run_pipeline(spark, df, cfg)
    fast = run_pipeline(spark, df, cfg, eager_metrics="persist")
    a = sorted((r["file_id"], r["cluster_id"]) for r in lazy.clusters.collect())
    b = sorted((r["file_id"], r["cluster_id"]) for r in fast.clusters.collect())
    assert a == b
