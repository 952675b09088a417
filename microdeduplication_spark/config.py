"""Pipeline configuration.

One frozen dataclass carries every tunable of the dedup pipeline so that the
"identical shingle/signature config" reproducibility requirement
(BASELINE.json north_rule) is a single value-equality check.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class DedupConfig:
    # --- shingling -------------------------------------------------------
    # token k-shingles over normalized content; tokens are [A-Za-z0-9_]+ runs
    shingle_k: int = 5

    # --- MinHash / LSH ---------------------------------------------------
    num_perms: int = 128
    lsh_bands: int = 32          # bands * rows_per_band == num_perms
    rows_per_band: int = 4
    # detection prob at jaccard s: 1 - (1 - s^r)^b ; s=0.7,r=4,b=32 -> 0.9998

    # --- SimHash ---------------------------------------------------------
    simhash_bits: int = 64
    simhash_tables: int = 4      # split 64 bits into 4 x 16-bit probe keys
    hamming_threshold: int = 3   # 4 tables guarantee recall for distance <= 3

    # --- substring (windowed line-hash fingerprint) pass -----------------
    substr_window: int = 8       # consecutive normalized lines per fingerprint
    containment_threshold: float = 0.6   # |A cap B| / min(|A|,|B|) on line sets

    # --- verification / clustering --------------------------------------
    jaccard_threshold: float = 0.7

    # --- skew / scale knobs ----------------------------------------------
    # LSH buckets larger than this are salted into sub-buckets before the
    # self-join (north_rule: "salted keys and AQE-driven repartitioning").
    bucket_cap: int = 256
    # buckets larger than this are dropped entirely (degenerate bands --
    # near-empty shingle sets); the count is reported in stage metrics.
    bucket_drop: int = 20000
    # max candidate pairs verified per file pair source before sampling kicks
    # in (guard against adversarial all-same corpora); 0 = unlimited.
    max_pairs_per_bucket: int = 0

    # --- determinism ------------------------------------------------------
    seed: int = 42

    def __post_init__(self) -> None:
        if self.lsh_bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"lsh_bands*rows_per_band ({self.lsh_bands}*{self.rows_per_band}) "
                f"must equal num_perms ({self.num_perms})"
            )
        if self.simhash_bits % self.simhash_tables != 0:
            raise ValueError("simhash_bits must divide evenly into simhash_tables")

    @property
    def simhash_band_bits(self) -> int:
        return self.simhash_bits // self.simhash_tables

    def to_dict(self) -> dict:
        return asdict(self)


DEFAULT_CONFIG = DedupConfig()
