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


def test_url_key_and_suffix_filter(spark):
    from pyspark.sql import functions as F

    from microdeduplication_spark.sources.files_source import (
        url_key,
        url_suffix_keep,
    )

    rows = [
        ("http://g.delfi.ee/s/img/back_grey.gif", "2015-02-14T09:09:21Z"),
        ("https://ex.ee/a/b?x=1&y=2", "2016-01-01T00:00:00Z"),
        ("http://ex.ee/static/app.js", "2016-01-01T00:00:00Z"),
    ]
    df = spark.createDataFrame(rows, ["url", "date"])
    got = df.select(
        url_key(F.col("url"), F.col("date")).alias("k"),
        url_suffix_keep(F.col("url")).alias("keep"),
    ).collect()
    # the reference's documented nutch-style example shape
    assert got[0]["k"] == "http::g.delfi.ee::/s/img/back_grey.gif::null::20150214090921"
    assert got[1]["k"] == "https::ex.ee::/a/b::x=1&y=2::20160101000000"
    assert [r["keep"] for r in got] == [True, True, False]
