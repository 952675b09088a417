"""Randomized parity: route_quad_blocks vs an independent Python
transcription of the reference control flow (ConvertionToEntities.java:62-183)
over ~200 generated blocks in multiple part scopes.

The oracle mirrors the JAVA else-if chain line by line (not the Spark code),
under the engine's documented deviations (entity_routing module docstring):
well-formed lines only, image inherited from image (not the :85 sku bug),
deterministic ids. Dual-type blocks (both Product and Offer markers) ARE
generated: they consume the pending map, store their post-inherit merge,
and emit nothing -- a prior Product's fields chain through them into the
next Offer (the round-3 deviation, now closed). Typeless blocks (predicate
lines only, no `<...org/Product>` / `<...org/Offer>` type line) are
generated too: they emit without touching the map.
"""

from __future__ import annotations

import re

import numpy as np

from microdeduplication_spark.operators.entity_routing import (
    ROUTED_FIELDS,
    route_quad_blocks,
)

PREDICATES = [
    "http://schema.org/Product/name",
    "http://schema.org/Offer/itemOffered",
    "http://schema.org/Product/image",
    "http://schema.org/Offer/image",
    "http://schema.org/Offer/price",
    "http://schema.org/Product/price",
    "http://schema.org/Offer/priceCurrency",
    "http://schema.org/Offer/currency",
    "http://schema.org/Product/currency",
    "http://schema.org/Product/description",
    "http://schema.org/Offer/description",
    "http://schema.org/Product/url",
    "http://schema.org/Product/sku",
    "http://schema.org/Offer/availability",
    "http://schema.org/Thing/unrelated",
]
OBJECTS = ["Red Bike", "", "x  y", "9,99", "EUR", "val-et tag", "a\\tb"]
KEYS = [
    "http://s.ee::shop.ee::20160101::q",
    "http://o.ee::off.ee",          # no part 2 -> no timestamp
    "justone",                       # no :: -> no provider either
    "",
]


def _gen_blocks(rng, n_parts=6, blocks_per_part=30):
    rows = []
    for part in range(n_parts):
        for pos in range(blocks_per_part):
            kind = int(rng.integers(0, 8))  # 0-2 P, 3-5 O, 6 dual, 7 typeless
            if kind <= 2:
                lines = ["<http://schema.org/Product>"]
            elif kind <= 5:
                lines = ["<http://schema.org/Offer>"]
            elif kind == 6:
                lines = ["<http://schema.org/Product>",
                         "<http://schema.org/Offer>"]
            else:
                lines = []  # typeless: predicate lines only
            for _ in range(int(rng.integers(0, 6))):
                key = KEYS[int(rng.integers(0, len(KEYS)))]
                pred = PREDICATES[int(rng.integers(0, len(PREDICATES)))]
                obj = OBJECTS[int(rng.integers(0, len(OBJECTS)))]
                if rng.integers(0, 8) == 0:  # malformed: 3 fields
                    lines.append(f"<{key}>, <n>, <{pred}>")
                else:
                    lines.append(f"<{key}>, <n>, <{pred}>, <{obj}>")
            rows.append((part, pos, "\n".join(lines)))
    return rows


# --- Python transcription of the Java routing -------------------------------

_FIRST = {"name", "price", "currency", "description"}


def _branch_of(line: str) -> str | None:
    """The reference else-if chain (ConvertionToEntities.java:95-124)."""
    if "Product/name" in line or "Offer/itemOffered" in line:
        return "name"
    if "Product/image" in line or "Offer/image" in line:
        return "image_url"
    if "Offer/price" in line or "Product/price" in line:
        return "price"
    if ("Offer/priceCurrency" in line or "Offer/currency" in line
            or "Product/currency" in line):
        return "currency"
    if "Product/description" in line or "Offer/description" in line:
        return "description"
    if "Product/url" in line:
        return "prod_url"
    if "Product/sku" in line:
        return "sku"
    if "Offer/availability" in line:
        return "availability"
    return None


def _route_block(text: str) -> dict:
    fields: dict = {f: None for f in ROUTED_FIELDS}
    for line in text.split("\n"):
        parts = line.split(">, ")
        if len(parts) < 4:
            continue  # engine deviation: malformed lines contribute nothing
        obj = parts[3]
        b = _branch_of(line)
        if b is None:
            continue
        if b in _FIRST:
            if fields[b] is None:
                fields[b] = obj
        else:
            fields[b] = obj
        if b in ("name", "price"):
            details = parts[0].split("::")
            if fields["provider"] is None and len(details) >= 2:
                p = details[0] + details[1]
                if p:
                    fields["provider"] = p
            if fields["time_stamp"] is None and len(details) >= 3 and details[2]:
                fields["time_stamp"] = details[2]
    return fields


def _clear(s: str) -> str:
    s = re.sub(r"\\t|\\n", " ", s)
    s = re.sub(r"(@|-)(et|en|ru|de|ee)\b", "", s)
    s = re.sub(r"[<>]", "", s)
    s = re.sub(r"\s+", " ", s)
    return s.strip()


def _oracle(rows):
    out = {}
    by_part: dict = {}
    for part, pos, text in rows:
        by_part.setdefault(part, []).append((pos, text))
    for part, blocks in by_part.items():
        pending = None
        for pos, text in sorted(blocks):
            is_product = ".org/Product>" in text
            is_offer = ".org/Offer>" in text
            own = _route_block(text)
            merged = dict(own)
            if is_offer:
                if pending is not None:
                    for f in ROUTED_FIELDS:
                        if f in _FIRST or f in ("provider", "time_stamp"):
                            # inherit wins when the product assigned it
                            if pending[f] is not None:
                                merged[f] = pending[f]
                        else:
                            # offer's own last-wins lines override inherit
                            if own[f] is None:
                                merged[f] = pending[f]
                pending = None
            if is_product:
                # the reference stores the POST-INHERIT merged locals: a
                # dual-type block chains the consumed map into the next map
                pending = merged
            else:
                out[(part, pos)] = {
                    f: _clear(merged[f] or "") for f in ROUTED_FIELDS
                }
    return out


def test_routing_fuzz_matches_java_transcription(spark):
    rng = np.random.default_rng(2024)
    rows = _gen_blocks(rng)
    want = _oracle(rows)
    df = spark.createDataFrame(rows, ["part", "pos", "block"])
    got = {
        (r["part"], r["id"]): {f: r[f] for f in ROUTED_FIELDS}
        for r in route_quad_blocks(df).collect()
    }
    assert set(got) == set(want)
    mismatches = {
        k: (got[k], want[k]) for k in want if got[k] != want[k]
    }
    assert not mismatches, list(mismatches.items())[:3]
