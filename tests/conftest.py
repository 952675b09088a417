"""Shared pytest fixtures: one SparkSession, one deterministic corpus."""

from __future__ import annotations

import pytest

from microdeduplication_spark.config import DedupConfig
from microdeduplication_spark.fixtures import make_corpus
from microdeduplication_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="pytest-dedup", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return DedupConfig()


@pytest.fixture(scope="session")
def corpus(cfg):
    return make_corpus(n_files=600, seed=42, config=cfg)
