"""Deterministic hash-based sampling for training-mix construction.

No reference counterpart; this is the pipeline op that turns a deduped
corpus into a weighted training mix ("keep 50% of en, 30% of zh, 10% of
everything else"). df.sample()/sampleBy() are the wrong tool at 100 TB:
their output depends on partition layout and RNG state, so a re-run, a
repartition, or an AQE re-plan silently changes WHICH rows are kept and
lineage recovery replays a different sample. Hashing the row key instead
makes membership a pure function of the row: reproducible across runs,
partitionings, engines (the md5-32 family is the same one
doc_fingerprints proves cross-engine exact), and incremental batches --
a doc keeps/drops identically whenever it arrives.

Scale design: a map-side filter, zero exchanges, whole-stage codegen
(md5 + conv + pmod are JVM built-ins; the strata thresholds compile to a
CASE chain). Rates are exact in expectation and concentrate tightly at
corpus scale (binomial over ~10^12 keys); nested samples compose by
salting (salt="v2" draws an independent sample).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def sample_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, BUCKETS) from md5-32 of (key, salt).

    Cross-engine exact: DuckDB replays it as
    ('0x' || substr(md5(key || salt), 1, 8))::BIGINT % 1000000."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(BUCKETS))


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic `fraction` of rows by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(round(fraction * BUCKETS))
    return df.where(sample_bucket(F.col(key_col), salt) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    default_fraction: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows (training-mix
    weighting). Strata not in `fractions` keep `default_fraction`."""
    for k, v in {**fractions, "<default>": default_fraction}.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    thr: Column | None = None
    for k in sorted(fractions):
        t = F.lit(int(round(fractions[k] * BUCKETS)))
        cond = F.col(strata_col) == F.lit(k)
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default = F.lit(int(round(default_fraction * BUCKETS)))
    thr_col = default if thr is None else thr.otherwise(default)
    return df.where(sample_bucket(F.col(key_col), salt) < thr_col)
