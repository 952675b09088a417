"""Content normalization + shingling as pure Column expressions (JVM-side).

The reference normalizes payloads with per-record Java string munging
(clearLine /root/reference/deduplicaiton/.../utils/Util.java:20-34, HTML repair
FixHTMLPairFlatMapFunction.java:43-111). Here normalization and shingling are
whole-stage-codegen'd Catalyst expressions -- no Python in the hot path at all
(BASELINE.json input_hint). Only MinHash/SimHash signature computation
(hashing.py) uses vectorized Arrow pandas_udfs.

A pure-Python mirror of every function lives at the bottom of this module; the
fixture generator and the pytest oracles use it, and test_text.py pins the two
implementations together row by row.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokens are runs of identifier characters; everything else is a separator.
TOKEN_RE = r"[^A-Za-z0-9_]+"
# Unit separator: cannot occur inside a token, so joined shingles are unambiguous.
SHINGLE_SEP = "\x1f"


def normalize_content(col: Column) -> Column:
    """Whitespace-canonical form of source text.

    CRLF -> LF, tab/space runs -> single space, trim around newlines, collapse
    blank lines, trim ends. Deterministic, lang-agnostic (comment stripping is
    deliberately NOT done -- it would change sha256 identity semantics).
    Mirrors normalize_py below.
    """
    c = F.regexp_replace(col, r"\r\n?", "\n")
    c = F.regexp_replace(c, r"[ \t\x0b\f]+", " ")
    # one pass merging the old ' ?\n ?' + '\n+' pair: after the run-collapse
    # above, any whitespace run containing a newline reduces to exactly one
    # '\n' either way (verified equivalent by exhaustive enumeration over
    # {' ','\n','x'}^<=10 plus 200k-case fuzz); saves a full scan of every
    # content string. normalize_py keeps the two-pass spelling -- the
    # contract is identical OUTPUT, pinned row-by-row in test_text.py.
    c = F.regexp_replace(c, r" ?\n[ \n]*", "\n")
    # trim() strips only spaces; strip leading/trailing newlines too (== str.strip())
    return F.regexp_replace(c, r"^[\n ]+|[\n ]+$", "")


def content_sha256(col: Column) -> Column:
    """Lowercase-hex sha256 of the (raw, un-normalized) content string.

    Per-row invariant vs the reference (BASELINE.json input_hint): byte
    equality of content <=> sha256 equality; verified against hashlib in
    tests (sha256_py).
    """
    return F.sha2(col.cast("binary"), 256)


def tokens(col: Column) -> Column:
    """array<string> of identifier tokens of the normalized content."""
    return F.filter(F.split(col, TOKEN_RE), lambda t: t != F.lit(""))


def shingle_hashes(tok: Column, k: int) -> Column:
    """Distinct, sorted xxhash64 values of the k-token shingles of `tok`.

    Entirely Catalyst higher-order functions: sequence + transform + slice +
    xxhash64. Files shorter than k tokens hash their full token list as one
    shingle so that short files still participate in MinHash.
    Mirrors shingles_py (modulo hashing, which cannot collide materially).

    PERFORMANCE CONTRACT: `tok` MUST be a materialized column reference (a
    prior .select alias), never an inline expression like tokens(normalize(
    col)) -- the transform lambda below references `tok` once per shingle,
    and Catalyst re-evaluates a non-attribute argument on every lambda
    invocation, turning an O(n) shingle pass into O(n^2) regex work.
    """
    n = F.size(tok)
    full = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.xxhash64(F.concat_ws(SHINGLE_SEP, F.slice(tok, i + F.lit(1), k))),
    )
    short = F.array(F.xxhash64(F.concat_ws(SHINGLE_SEP, tok)))
    empty = F.array().cast("array<bigint>")
    return F.array_sort(
        F.array_distinct(
            F.when(n >= F.lit(k), full).when(n > F.lit(0), short).otherwise(empty)
        )
    )


def line_hashes(norm_col: Column) -> Column:
    """xxhash64 of each normalized line (order-preserving, non-distinct).

    Basis of the substring pass (operators/substring.py): the reference's
    sorted-window adjacency (Deduplication.java:103-104) becomes shared
    window-of-lines fingerprints.
    """
    return F.transform(F.split(norm_col, r"\n"), lambda ln: F.xxhash64(ln))


# ---------------------------------------------------------------------------
# Pure-Python mirrors (test oracles + fixture generator). Keep in lockstep
# with the Column versions above; test_text.py enforces it.
# ---------------------------------------------------------------------------

_WS_RUN = re.compile(r"[ \t\x0b\f]+")
_NL_TRIM = re.compile(r" ?\n ?")
_NL_RUN = re.compile(r"\n+")
_TOKEN_SPLIT = re.compile(TOKEN_RE)


def normalize_py(s: str) -> str:
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _WS_RUN.sub(" ", s)
    s = _NL_TRIM.sub("\n", s)
    s = _NL_RUN.sub("\n", s)
    return s.strip()


def sha256_py(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def tokens_py(norm: str) -> list[str]:
    return [t for t in _TOKEN_SPLIT.split(norm) if t]


def shingles_py(norm: str, k: int) -> set[str]:
    """String k-shingles (unhashed) -- the exact-Jaccard oracle works on these."""
    toks = tokens_py(norm)
    if not toks:
        return set()
    if len(toks) < k:
        return {SHINGLE_SEP.join(toks)}
    return {SHINGLE_SEP.join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard_py(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)
