"""Deterministic synthetic corpus generator with planted duplicate truth.

Generates the `files(repo, path, commit, lang, content)` table mandated by
BASELINE.json input_hint, plus golden truth tables (FIXTURES.md §1-2):

- truth_pairs    (a_fix, b_fix, kind)  -- spanning set per planted cluster,
                                          a_fix < b_fix; recall-gate input
- truth_clusters (fix_id, cluster_fix) -- cluster_fix = min fix_id of component
- truth_nonpairs (a_fix, b_fix)        -- adversarial below-threshold pairs;
                                          precision-gate input

This is the analog of the reference's gold dataset for its evaluation job
(/root/reference/deduplicaiton/.../processes/EvaluateDeduplication.java:30-105).
All randomness flows from one numpy PCG64(seed): same seed => byte-identical
corpus. No external data.

`fix_id` is the generator-side row id (0..n-1). The engine keys rows by
file_id = xxhash64(repo, path, commit); tests translate via fix_to_file_id().

Planted near-duplicate pairs are *certified*: after mutation the generator
recomputes exact token-shingle Jaccard with the same normalizer/tokenizer the
engine uses (functions/text.py pure-Python mirror) and only records the pair
in truth_pairs if J >= jaccard_threshold + margin. Adversarial non-pairs are
certified below threshold - margin. The truth therefore IS the
reference-semantics answer at the configured thresholds, not an approximation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from microdeduplication_spark.config import DedupConfig
from microdeduplication_spark.functions.text import jaccard_py, normalize_py, shingles_py

LANGS = ["python", "java", "javascript", "go", "c"]
LANG_EXT = {"python": "py", "java": "java", "javascript": "js", "go": "go", "c": "c"}
_KEYWORDS = ["let", "var", "def", "fn", "set", "val", "const", "mut"]
_FUNCS = ["map", "fold", "join", "scan", "emit", "read", "walk", "pack", "sort", "mask"]


@dataclass
class Corpus:
    files: pd.DataFrame          # repo, path, commit, lang, content  (+ fix_id col)
    truth_pairs: pd.DataFrame    # a_fix, b_fix, kind
    truth_clusters: pd.DataFrame  # fix_id, cluster_fix
    truth_nonpairs: pd.DataFrame  # a_fix, b_fix
    config: DedupConfig


def _ident(rng: np.random.Generator) -> str:
    return f"{_FUNCS[rng.integers(len(_FUNCS))]}_{rng.integers(100000)}"


def _line(rng: np.random.Generator) -> str:
    kw = _KEYWORDS[rng.integers(len(_KEYWORDS))]
    return (
        f"{kw} {_ident(rng)} = {_FUNCS[rng.integers(len(_FUNCS))]}"
        f"({_ident(rng)}, {rng.integers(10000)})"
    )


def _base_content(rng: np.random.Generator, n_lines: int) -> str:
    return "\n".join(_line(rng) for _ in range(n_lines))


def _mutate(rng: np.random.Generator, content: str, frac: float) -> str:
    """Replace ~frac of lines with fresh ones; occasionally insert/delete."""
    lines = content.split("\n")
    n_mut = max(1, int(len(lines) * frac))
    idx = rng.choice(len(lines), size=min(n_mut, len(lines)), replace=False)
    for i in idx:
        lines[i] = _line(rng)
    if rng.random() < 0.3 and len(lines) > 4:
        lines.insert(int(rng.integers(len(lines))), _line(rng))
    return "\n".join(lines)


def make_corpus(n_files: int = 1000, seed: int = 42,
                config: DedupConfig | None = None) -> Corpus:
    cfg = config or DedupConfig(seed=seed)
    rng = np.random.default_rng(seed)
    margin = 0.03

    contents: list[str] = []
    langs: list[str] = []
    pairs: list[tuple[int, int, str]] = []
    nonpairs: list[tuple[int, int]] = []
    # union-find over fix ids for truth clusters
    parent: list[int] = []

    def _find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def _union(a: int, b: int) -> None:
        ra, rb = _find(a), _find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    def _add(content: str, lang: str) -> int:
        contents.append(content)
        langs.append(lang)
        parent.append(len(parent))
        return len(contents) - 1

    def _jac(a: int, b: int) -> float:
        return jaccard_py(
            shingles_py(normalize_py(contents[a]), cfg.shingle_k),
            shingles_py(normalize_py(contents[b]), cfg.shingle_k),
        )

    def _certified_near(base_fix: int, frac: float, lang: str) -> int | None:
        """Mutate until the copy lands above threshold+margin (<=5 tries)."""
        f = frac
        for _ in range(5):
            cand = _mutate(rng, contents[base_fix], f)
            j = jaccard_py(
                shingles_py(normalize_py(cand), cfg.shingle_k),
                shingles_py(normalize_py(contents[base_fix]), cfg.shingle_k),
            )
            if j >= cfg.jaccard_threshold + margin:
                fix = _add(cand, lang)
                return fix
            f *= 0.5
        return None

    n_exact = max(2, int(n_files * 0.12))
    n_hot = max(3, int(n_files * 0.05))
    n_near = max(2, int(n_files * 0.15))
    n_sub = max(2, int(n_files * 0.05))
    n_chain = max(3, int(n_files * 0.06))
    n_adv = max(2, int(n_files * 0.04))

    # --- independent base files -------------------------------------------
    n_base = max(
        10, n_files - n_exact - n_hot - n_near - n_sub - n_chain - n_adv
    )
    for _ in range(n_base):
        lang = LANGS[rng.choice(len(LANGS), p=[0.4, 0.2, 0.2, 0.1, 0.1])]
        _add(_base_content(rng, int(rng.integers(20, 200))), lang)

    # --- exact-duplicate clusters (incl. one hot cluster: skew path) -------
    placed = 0
    while placed < n_exact:
        size = int(rng.integers(2, 7))
        size = min(size, n_exact - placed) or 2
        lang = LANGS[int(rng.integers(len(LANGS)))]
        base = _add(_base_content(rng, int(rng.integers(20, 120))), lang)
        placed += 1
        for _ in range(size - 1):
            dup = _add(contents[base], lang)
            pairs.append((base, dup, "exact"))
            _union(base, dup)
            placed += 1
    hot_base = _add(_base_content(rng, 60), "python")
    for _ in range(n_hot - 1):
        dup = _add(contents[hot_base], "python")
        pairs.append((hot_base, dup, "exact_hot"))
        _union(hot_base, dup)

    # --- near-duplicate pairs/triples --------------------------------------
    placed = 0
    while placed < n_near:
        lang = LANGS[int(rng.integers(len(LANGS)))]
        base = _add(_base_content(rng, int(rng.integers(40, 200))), lang)
        placed += 1
        n_copies = 1 if rng.random() < 0.7 else 2
        for _ in range(n_copies):
            if placed >= n_near:
                break
            fix = _certified_near(base, float(rng.uniform(0.01, 0.08)), lang)
            if fix is not None:
                pairs.append((base, fix, "near"))
                _union(base, fix)
                placed += 1

    # --- substring containment (A verbatim inside bigger B) ----------------
    placed = 0
    while placed < n_sub:
        lang = LANGS[int(rng.integers(len(LANGS)))]
        inner_lines = int(rng.integers(30, 80))
        inner = _base_content(rng, inner_lines)
        extra = _base_content(rng, int(inner_lines * rng.uniform(0.3, 0.6)))
        a = _add(inner, lang)
        b = _add(inner + "\n" + extra, lang)
        pairs.append((a, b, "substring"))
        _union(a, b)
        placed += 2

    # --- transitive chains A~B~C (A-C below direct threshold) --------------
    placed = 0
    while placed < n_chain:
        lang = LANGS[int(rng.integers(len(LANGS)))]
        a = _add(_base_content(rng, int(rng.integers(60, 160))), lang)
        placed += 1
        b = _certified_near(a, 0.10, lang)
        if b is None:
            continue
        pairs.append((a, b, "chain"))
        _union(a, b)
        placed += 1
        c = _certified_near(b, 0.10, lang)
        if c is not None:
            pairs.append((b, c, "chain"))
            _union(b, c)
            placed += 1

    # --- adversarial non-duplicates (same vocab/length, below threshold) ---
    placed = 0
    while placed < n_adv:
        lang = LANGS[int(rng.integers(len(LANGS)))]
        base = _add(_base_content(rng, 80), lang)
        fix = _add(_mutate(rng, contents[base], 0.6), lang)
        if _jac(base, fix) < cfg.jaccard_threshold - margin:
            nonpairs.append((base, fix))
        placed += 2

    # --- assemble files table ----------------------------------------------
    n = len(contents)
    perm = rng.permutation(n)  # shuffle so planted groups are not adjacent
    rows = []
    for out_pos, fix in enumerate(perm):
        lang = langs[fix]
        commit = "".join(rng.choice(list("0123456789abcdef"), size=40))
        rows.append(
            {
                "fix_id": int(fix),
                "repo": f"org{out_pos % 7}/repo{out_pos % 101}",
                "path": f"src/m{out_pos % 13}/f{out_pos}.{LANG_EXT[lang]}",
                "commit": commit,
                "lang": lang,
                "content": contents[fix],
            }
        )
    files = pd.DataFrame(rows)

    truth_pairs = pd.DataFrame(
        [(min(a, b), max(a, b), k) for a, b, k in pairs],
        columns=["a_fix", "b_fix", "kind"],
    ).drop_duplicates(subset=["a_fix", "b_fix"])
    truth_clusters = pd.DataFrame(
        {"fix_id": range(n), "cluster_fix": [_find(i) for i in range(n)]}
    )
    truth_nonpairs = pd.DataFrame(nonpairs, columns=["a_fix", "b_fix"])
    return Corpus(files, truth_pairs, truth_clusters, truth_nonpairs, cfg)


def files_spark_df(spark, corpus: Corpus, with_fix_id: bool = False):
    """Corpus -> Spark DataFrame in the exact input_hint shape."""
    cols = ["repo", "path", "commit", "lang", "content"]
    if with_fix_id:
        cols = ["fix_id"] + cols
    return spark.createDataFrame(corpus.files[cols])


def fix_to_file_id(spark, corpus: Corpus):
    """Mapping DataFrame (fix_id, file_id) using the engine's id function."""
    from pyspark.sql import functions as F

    return (
        files_spark_df(spark, corpus, with_fix_id=True)
        .select("fix_id", F.xxhash64("repo", "path", "commit").alias("file_id"))
    )
