"""MinHash + SimHash signatures as vectorized Arrow pandas_udfs.

The only Python in the pipeline's hot path (BASELINE.json input_hint allows
exactly this: "vectorized pandas/Arrow UDFs, no per-row Python"). Everything
is flat numpy over the concatenation of a whole Arrow batch's shingle arrays
-- no per-row Python loops -- using np.minimum.reduceat / np.add.reduceat for
the per-row reductions.

Replaces the reference's per-comparison term-frequency cosine similarity
(/root/reference/deduplicaiton/.../utils/CosineSimilarity.java:13-56) with
precomputed signatures: similarity becomes a join problem instead of an
O(window^2) per-pair recomputation.

Hash family: per-permutation 64-bit XOR mask followed by the splitmix64
finalizer (public-domain mixing constants from Steele et al., "Fast
Splittable Pseudorandom Number Generators", also used by java.util.SplittableRandom).
Deterministic across runs/machines: masks derive from numpy PCG64(seed),
all arithmetic is explicit uint64 wraparound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

U64 = np.uint64
_EMPTY_SENTINEL = np.iinfo(np.int64).max  # sig rows for empty shingle sets

# chunk the flattened shingle stream so (perms x chunk) stays ~64 MB
_FLAT_CHUNK = 1 << 16


def perm_masks(num_perms: int, seed: int) -> np.ndarray:
    """(num_perms,) uint64 XOR masks; deterministic in (num_perms, seed)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, np.iinfo(np.uint64).max, size=num_perms, dtype=np.uint64)


def splitmix64(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wraparound semantics)."""
    z = z.astype(U64, copy=True)
    with np.errstate(over="ignore"):
        z ^= z >> U64(30)
        z *= U64(0xBF58476D1CE4E5B9)
        z ^= z >> U64(27)
        z *= U64(0x94D049BB133111EB)
        z ^= z >> U64(31)
    return z


def _flatten(series: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate a batch of int64 arrays -> (flat uint64, row lengths, offsets)."""
    arrs = [np.asarray(a, dtype=np.int64) if a is not None else np.empty(0, np.int64)
            for a in series]
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    flat = (np.concatenate(arrs) if arrs else np.empty(0, np.int64)).view(U64)
    offsets = np.zeros(len(arrs), dtype=np.int64)
    if len(arrs) > 1:
        np.cumsum(lens[:-1], out=offsets[1:])
    return flat, lens, offsets


def minhash_batch(series: pd.Series, masks: np.ndarray) -> pd.Series:
    """MinHash signatures for one Arrow batch of shingle arrays."""
    flat, lens, offsets = _flatten(series)
    n_rows, n_perms = len(lens), len(masks)
    sigs = np.full((n_rows, n_perms), _EMPTY_SENTINEL, dtype=np.int64)
    nonempty = lens > 0
    if flat.size:
        # process rows in groups whose flattened length fits the chunk budget
        row_ends = offsets + lens
        start_row = 0
        while start_row < n_rows:
            while start_row < n_rows and lens[start_row] == 0:
                start_row += 1
            if start_row >= n_rows:
                break
            end_row = start_row + 1
            while (end_row < n_rows
                   and row_ends[end_row - 1] + lens[end_row] - offsets[start_row] <= _FLAT_CHUNK):
                end_row += 1
            lo, hi = offsets[start_row], row_ends[end_row - 1]
            seg = flat[lo:hi]                                   # (m,)
            hashed = splitmix64(seg[None, :] ^ masks[:, None])  # (P, m)
            seg_rows = np.arange(start_row, end_row)[nonempty[start_row:end_row]]
            seg_offsets = (offsets[seg_rows] - lo).astype(np.intp)
            mins = np.minimum.reduceat(hashed, seg_offsets, axis=1)  # (P, rows)
            sigs[seg_rows, :] = mins.T.view(np.int64)
            start_row = end_row
    return pd.Series(list(sigs))


def simhash_batch(series: pd.Series, bits: int = 64) -> pd.Series:
    """64-bit SimHash per row: majority vote of each bit over shingle hashes."""
    flat, lens, offsets = _flatten(series)
    n_rows = len(lens)
    out = np.zeros(n_rows, dtype=np.int64)
    nonempty = lens > 0
    if flat.size:
        shifts = np.arange(bits, dtype=np.uint64)
        # re-mix so the simhash family is independent of the minhash family
        mixed = splitmix64(flat ^ U64(0xA076_1D64_78BD_642F))
        bitmat = ((mixed[:, None] >> shifts[None, :]) & U64(1)).astype(np.int64)
        ne_offsets = offsets[nonempty].astype(np.intp)
        counts = np.add.reduceat(bitmat, ne_offsets, axis=0)      # (rows, bits)
        majority = (2 * counts) > lens[nonempty][:, None]         # ties -> 0
        weights = (np.uint64(1) << shifts).view(np.int64)
        out[nonempty] = (majority.astype(np.int64) * weights[None, :]).sum(
            axis=1, dtype=np.int64
        )
    return pd.Series(out)


def make_minhash_udf(num_perms: int, seed: int):
    """pandas_udf: array<long> shingles -> array<long> signature (len num_perms)."""
    masks = perm_masks(num_perms, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(shingles: pd.Series) -> pd.Series:
        return minhash_batch(shingles, masks)

    return minhash_udf


def make_simhash_udf(bits: int = 64):
    """pandas_udf: array<long> shingles -> long (64-bit SimHash)."""

    @F.pandas_udf(T.LongType())
    def simhash_udf(shingles: pd.Series) -> pd.Series:
        return simhash_batch(shingles, bits)

    return simhash_udf
