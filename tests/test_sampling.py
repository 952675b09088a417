"""Deterministic hash sampling: reproducibility, strata rates, composition."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from microdeduplication_spark.operators.sampling import (
    BUCKETS,
    hash_sample,
    sample_bucket,
    stratified_sample,
)


def _bucket_py(key, salt: str = "") -> int:
    return int(hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8], 16) % BUCKETS


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_bucket_matches_python_md5(spark):
    """The Spark column replays hashlib md5-32 exactly (the cross-engine
    contract the DuckDB oracle relies on)."""
    df = spark.createDataFrame(
        [(i,) for i in [0, 1, 7, 123456789, -5]], "doc_id long"
    )
    got = {r.doc_id: r.b for r in df.select(
        "doc_id", sample_bucket(F.col("doc_id")).alias("b")).collect()}
    assert got == {i: _bucket_py(i) for i in got}
    salted = {r.doc_id: r.b for r in df.select(
        "doc_id", sample_bucket(F.col("doc_id"), "v2").alias("b")).collect()}
    assert salted == {i: _bucket_py(i, "v2") for i in salted}


def test_sample_is_reproducible_and_partition_invariant(spark, docs):
    a = {r.doc_id for r in hash_sample(docs, 0.3).collect()}
    b = {r.doc_id for r in hash_sample(docs.repartition(17), 0.3).collect()}
    assert a == b  # df.sample() fails this; hash membership cannot
    assert abs(len(a) / 3000 - 0.3) < 0.05


def test_nested_samples_compose_by_salt(spark, docs):
    base = hash_sample(docs, 0.5)
    resample = {r.doc_id for r in hash_sample(base, 0.5, salt="v2").collect()}
    plain = {r.doc_id for r in hash_sample(base, 0.5).collect()}
    # same salt nests degenerately (subset = identical); a new salt draws
    # an independent ~50% of the base sample
    assert plain == {r.doc_id for r in base.collect()}
    n_base = base.count()
    assert abs(len(resample) / n_base - 0.5) < 0.1


def test_stratified_rates_and_default(spark, docs):
    out = stratified_sample(
        docs, {"en": 0.8, "de": 0.2}, default_fraction=0.05
    )
    by_lang = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(by_lang["en"] / 1000 - 0.8) < 0.1
    assert abs(by_lang["de"] / 1000 - 0.2) < 0.1
    assert by_lang.get("zh", 0) / 1000 < 0.12
    # stratum membership is the SAME hash: a doc kept at 0.2 is kept at 0.8
    de_ids = {r.doc_id for r in out.where(F.col("lang") == "de").collect()}
    en_like = {r.doc_id for r in stratified_sample(
        docs, {"de": 0.8}, default_fraction=0).collect()}
    assert de_ids <= en_like


def test_fraction_bounds_rejected(spark, docs):
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs, 1.5)
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, {"en": -0.1})


def test_plan_is_filter_only_no_exchange(spark, docs):
    plan = stratified_sample(docs, {"en": 0.5}, default_fraction=0.1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
