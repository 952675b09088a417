"""Fast deterministic corpus generator for benchmarks.

Unlike fixtures.make_corpus (which certifies every planted near-pair with an
exact-Jaccard computation -- right for correctness tests, too slow beyond
~1k files), this builds contents from a pre-sampled line pool with numpy and
plants uncertified duplicate structure. Throughput benchmarks need realistic
shape (dup ratio, near-dup mutation rate, hot exact cluster), not certified
truth; the recall gate lives in tests/, not bench.

Deterministic in (n_files, seed). Cached as parquet by bench.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

LANGS = ["python", "java", "javascript", "go", "c"]
EXT = {"python": "py", "java": "java", "javascript": "js", "go": "go", "c": "c"}


def make_bench_files(n_files: int, seed: int = 42,
                     mean_lines: int = 80) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    kw = np.array(["let", "var", "def", "fn", "set", "val", "const", "mut"])
    fns = np.array(["map", "fold", "join", "scan", "emit", "read", "walk",
                    "pack", "sort", "mask"])
    pool_n = max(n_files * 8, 20000)
    pool = (
        pd.Series(kw[rng.integers(0, len(kw), pool_n)])
        + " "
        + pd.Series(fns[rng.integers(0, len(fns), pool_n)]).str.cat(
            pd.Series(rng.integers(0, 100000, pool_n)).astype(str), sep="_"
        )
        + " = "
        + pd.Series(fns[rng.integers(0, len(fns), pool_n)]).str.cat(
            pd.Series(rng.integers(0, 10000, pool_n)).astype(str), sep="("
        )
        + ")"
    ).to_numpy()

    n_base = int(n_files * 0.70)
    contents: list[str] = []
    for _ in range(n_base):
        n_lines = int(rng.integers(mean_lines // 2, mean_lines * 2))
        contents.append("\n".join(rng.choice(pool, n_lines)))

    # exact duplicates incl. a hot cluster (5%)
    n_exact = int(n_files * 0.12)
    hot = contents[0]
    for i in range(n_exact):
        if i < int(n_files * 0.05):
            contents.append(hot)
        else:
            contents.append(contents[int(rng.integers(0, n_base))])

    # near duplicates: mutate 2-6% of lines of a random base
    while len(contents) < n_files:
        base = contents[int(rng.integers(0, n_base))].split("\n")
        n_mut = max(1, int(len(base) * rng.uniform(0.02, 0.06)))
        for j in rng.choice(len(base), min(n_mut, len(base)), replace=False):
            base[j] = str(pool[int(rng.integers(0, pool_n))])
        contents.append("\n".join(base))

    perm = rng.permutation(len(contents))
    langs = [LANGS[i % 5] for i in range(len(contents))]
    rows = {
        "repo": [f"org{i % 17}/repo{i % 211}" for i in range(len(perm))],
        "path": [
            f"src/m{i % 29}/f{i}.{EXT[langs[perm[i]]]}" for i in range(len(perm))
        ],
        "commit": [f"{rng.integers(0, 1 << 62):040x}" for _ in perm],
        "lang": [langs[p] for p in perm],
        "content": [contents[p] for p in perm],
    }
    return pd.DataFrame(rows)
