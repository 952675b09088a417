"""Multimodal (image/audio/video) column plumbing for a training-data pipeline.

Media payloads are opaque `binary` columns with typed metadata; decode /
feature-extraction steps run as Arrow-batched `mapInPandas` operators so the
Spark-side contract (schema, batching, partitioning) is real and tested even
though the actual codecs are NOT available in this container. The decode
kernels are therefore stubbed:

- `deterministic_fake=True` (default in tests) produces seeded, reproducible
  pseudo-features derived from the payload bytes -- the full pipeline runs.
- `deterministic_fake=False` raises NotImplementedError("media codecs not
  available in this environment") at evaluation time, marking exactly where a
  real libjpeg/ffmpeg kernel plugs in.

Scale notes: payloads never pass through Python row-at-a-time; mapInPandas
streams Arrow batches, and the output drops the binary column as early as
possible so shuffles carry only features. Frame sampling/resize parameters
are plan-time literals (re-plannable by AQE like any other stage).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms long, payload binary"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feat_dim int, features array<float>, "
    "payload_sha256 string"
)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-feature vector derived from payload bytes."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 64, deterministic_fake: bool = True
) -> DataFrame:
    """binary payload -> fixed-dim feature vector via Arrow mapInPandas.

    Real implementation point: replace _fake_features with an image decode +
    CNN/CLIP embed (or mel-spectrogram for audio). The Spark contract --
    Arrow batch in, Arrow batch out, binary column dropped on output -- is
    identical either way.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "plug a real decode kernel here"
                )
            feats = [
                _fake_features(p if p is not None else b"", dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_dim": dim,
                    "features": [f.tolist() for f in feats],
                    "payload_sha256": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video -> per-frame rows (frame timestamps planned JVM-side; decode is
    the stubbed kernel above). Emits (media_id, frame_ts_ms) via sequence +
    explode -- no Python."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def media_exact_dedup(media: DataFrame) -> DataFrame:
    """Exact media dedup by payload sha256 -- same groupBy(min) shape as the
    text pipeline's exact pass."""
    hashed = media.select(
        "media_id", F.sha2(F.col("payload"), 256).alias("payload_sha256")
    )
    return hashed.groupBy("payload_sha256").agg(
        F.min("media_id").alias("rep_id"), F.count("*").alias("group_size")
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no codecs needed)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.integers(0, 192)))
        if i % 7 == 0 and rows:  # planted exact duplicate payloads
            payload = rows[-1][-1]
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 512)),
                int(rng.integers(16, 512)),
                int(rng.integers(1000, 60000)),
                payload,
            )
        )
    return spark.createDataFrame(
        rows,
        schema="media_id long, kind string, mime string, width int, height int, "
        "duration_ms long, payload binary",
    )
