"""Reference-semantics parity: entity formation + SNM product dedup vs a
brute-force Python oracle (FIXTURES.md §4).

The oracle independently re-implements the reference's predicates -- blocking
key sort, window pairing, Product.equals / Product.compare with tf-cosine --
in plain Python, and the Spark job must produce identical duplicate groups.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from microdeduplication_spark.operators.entity_formation import (
    blocking_key,
    parse_product_lines,
    validity_filter,
)
from microdeduplication_spark.operators.reference_dedup import snm_dedup

WINDOW = 3


# ---------------------------------------------------------------------------
# deterministic product fixture: planted duplicate variants
# ---------------------------------------------------------------------------

def _product_rows():
    rng = np.random.default_rng(4242)
    names = ["red bike", "blue car toy", "wooden chair", "steel pan set",
             "green lamp", "silk scarf", "desk organizer", "coffee grinder"]
    providers = ["shop.example.ee", "store.market.ee", "goods.trade.com"]
    rows = []
    rid = 1
    for base_i in range(40):
        name = f"{names[base_i % len(names)]} model {base_i}"
        desc = f"fine {names[(base_i * 3) % len(names)]} with warranty {base_i}"
        provider = providers[base_i % 3]
        price = round(float(rng.uniform(1, 200)), 2)
        rows.append((rid, name, f"sku{base_i}", desc, f"http://img/{base_i}.jpg",
                     f"http://p/{base_i}", price, "EUR", "InStock", provider,
                     "20160101120000"))
        rid += 1
        kind = base_i % 4
        if kind == 0:  # exact-equals duplicate (name+domain+price equal)
            rows.append((rid, name, "", "", "", "", price, "EUR", "", provider,
                         "20160101130000"))
            rid += 1
        elif kind == 1:  # image-url match, same domain
            rows.append((rid, name + " extra", "", "other desc entirely",
                         f"http://img/{base_i}.jpg", "", price + 1.0, "EUR",
                         "", provider, ""))
            rid += 1
        elif kind == 2:  # fuzzy: name cosine > 0.5, desc cosine > 0.7
            rows.append((rid, name + " v2", f"sku{base_i}b",
                         desc + " extended", "", "", price + 0.5, "EUR", "",
                         provider, ""))
            rid += 1
        # kind == 3: no duplicate
    return rows


def _to_lines(rows):
    return [
        ";".join(f"<{v}>" for v in r)
        for r in rows
    ]


# ---------------------------------------------------------------------------
# brute-force oracle (independent implementation)
# ---------------------------------------------------------------------------

def _tok(s):
    return [t for t in re.split(r"\W+", s) if t]


def _cos(a, b):
    ta, tb = _tok(a), _tok(b)
    if not ta or not tb:
        return 0.0
    fa, fb = {}, {}
    for t in ta:
        fa[t] = fa.get(t, 0) + 1
    for t in tb:
        fb[t] = fb.get(t, 0) + 1
    dot = sum(fa[t] * fb.get(t, 0) for t in fa)
    na = math.sqrt(sum(v * v for v in fa.values()))
    nb = math.sqrt(sum(v * v for v in fb.values()))
    return dot / (na * nb) if na and nb else 0.0


def _slash0(p):
    # Java provider.split("/")[0]: whole string when no separator, "" for ""
    return p.split("/")[0]


def _match(a, b):
    # Direct transcription of the JAVA control flow (Product.java:92-140),
    # not of the Spark implementation, so drift in either is caught.
    # equals (:92-112)
    nam = a["name"] == b["name"]
    pro = False
    if not (a["provider"] == "" or b["provider"] == ""):
        pro = _slash0(a["provider"]) == _slash0(b["provider"])
    if not (a["price"] == 0.0 or b["price"] == 0.0):
        pri = a["price"] == b["price"]
    else:
        pri = True
    if nam and pro and pri:
        return True
    # compare (:114-140)
    if not (a["image_url"] == "" or b["image_url"] == ""):
        if (a["image_url"] == b["image_url"]
                and _slash0(a["provider"]) == _slash0(b["provider"])):
            return True
    name_sim = _cos(a["name"], b["name"])
    if name_sim == 1.0:
        if ((a["description"] == "" or b["description"] == "")
                and a["image_url"] == "" and b["image_url"] == ""):
            return True
    elif name_sim > 0.5:
        if _cos(a["description"], b["description"]) > 0.7:
            return True
    return False


def _oracle_clusters(products):
    """products: list of dicts incl id, block_key. Returns {id: cluster_id}."""
    order = sorted(products, key=lambda p: (p["block_key"], p["id"]))
    parent = {p["id"]: p["id"] for p in order}
    posmap = {p["id"]: i for i, p in enumerate(order)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            # min by sort position (first-seen representative)
            keep, drop = (rx, ry) if posmap[rx] < posmap[ry] else (ry, rx)
            parent[drop] = keep

    for i in range(len(order)):
        for off in range(1, WINDOW):
            if i + off < len(order) and _match(order[i], order[i + off]):
                union(order[i]["id"], order[i + off]["id"])
    return {p["id"]: find(p["id"]) for p in order}


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def parsed(spark):
    lines = _to_lines(_product_rows())
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    return parse_product_lines(df).persist()


def test_parse_roundtrip(parsed):
    rows = {r["id"]: r for r in parsed.collect()}
    src = {r[0]: r for r in _product_rows()}
    assert set(rows) == set(src)
    for rid, want in src.items():
        got = rows[rid]
        assert got["name"] == want[1]
        assert got["price"] == pytest.approx(want[6])
        assert got["provider"] == want[9]


def test_price_coercion_semantics(spark):
    lines = ["<1>;<n>;<s>;<d>;<i>;<u>;<12,50>;<EUR>;<a>;<p.ee>;<t>",
             "<2>;<n>;<s>;<d>;<i>;<u>;<eur 9.99 !>;<EUR>;<a>;<p.ee>;<t>",
             "<3>;<n>;<s>;<d>;<i>;<u>;<garbage>;<EUR>;<a>;<p.ee>;<t>",
             "<4>;<n>"]
    df = parse_product_lines(
        spark.createDataFrame([(l,) for l in lines], ["value"])
    )
    got = {r["id"]: r["price"] for r in df.collect()}
    assert got[1] == pytest.approx(12.50)
    assert got[2] == pytest.approx(9.99)
    assert got[3] == 0.0
    assert got[4] == 0.0  # missing trailing fields default


def test_validity_filter(spark):
    lines = ["<1>;<good name>;<sku>;<d>;<i>;<u>;<5.0>;<EUR>;<a>;<p.ee>;<t>",
             "<2>;<>;<sku>;<d>;<i>;<u>;<5.0>;<EUR>;<a>;<p.ee>;<t>",   # no name
             "<3>;<name>;<sku>;<d>;<i>;<u>;<0>;<EUR>;<a>;<p.ee>;<t>",  # price 0
             "<4>;<name>;<>;<>;<>;<>;<5.0>;<>;<a>;<p.ee>;<t>"]        # no aux
    df = validity_filter(parse_product_lines(
        spark.createDataFrame([(l,) for l in lines], ["value"])
    ))
    assert {r["id"] for r in df.collect()} == {1}


def test_eval_key_projection(spark):
    """EvaluateDeduplication.java:40-48 parity, incl. the replaceFirst-once
    rule, trim-after-strip, and the untrimmed description."""
    import re

    from microdeduplication_spark.evaluation import eval_keys_from_lines

    lines = [
        "<1>;<, red bike>;<s>;<great desc>;<i>;<u>;<5>;<EUR>;<a>;<p>;<t>",
        "<2>;<- - twice prefixed>;<s>;<d>;<i>;<u>;<5>;<EUR>;<a>;<p>;<t>",
        "<3>;<*x no match>;<s>;<d>;<i>;<u>;<5>;<EUR>;<a>;<p>;<t>",
        "<4>;< padded >;<s>;< desc >;<i>;<u>;<5>;<EUR>;<a>;<p>;<t>",
        "",  # empty line dropped (the reference's non-empty filter)
    ]

    def java_key(line):
        tuples = re.sub("<|>", "", line).split(";")
        name = re.sub(r"^[,.*%@!\-_+]\s", "", tuples[1], count=1).strip()
        return name + tuples[3]

    want = sorted(java_key(l) for l in lines if l)
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    got = sorted(r["key"] for r in eval_keys_from_lines(df).collect())
    assert got == want
    # the once-only strip leaves the second '- ' in place
    assert "- twice prefixeddd" not in got
    assert any(g.startswith("- twice prefixed") for g in got)
    assert any(g.startswith("*x no match") for g in got)


def test_snm_dedup_matches_bruteforce_oracle(spark, parsed):
    reps, clusters = snm_dedup(parsed, window=WINDOW)
    got = {r["id"]: r["cluster_id"] for r in clusters.collect()}

    keyed = blocking_key(parsed)
    prods = [r.asDict() for r in keyed.collect()]
    want = _oracle_clusters(prods)
    assert got == want

    # representatives = exactly the cluster ids
    got_reps = {r["id"] for r in reps.collect()}
    assert got_reps == set(want.values())
    # sanity: the fixture actually contains duplicates
    assert len(got_reps) < len(prods)


def test_to_reference_lines_roundtrip(spark, parsed):
    """Product.toString shape: trailing ';', Java-double price rendering;
    parse_product_lines round-trips it losslessly."""
    from microdeduplication_spark.operators.entity_formation import (
        to_reference_lines,
    )

    lines = to_reference_lines(parsed)
    sample = lines.take(3)
    assert all(r["value"].endswith(">;") for r in sample)
    assert all(r["value"].count(";") == 11 for r in sample)
    back = {r["id"]: r for r in parse_product_lines(lines).collect()}
    orig = {r["id"]: r for r in parsed.collect()}
    assert set(back) == set(orig)
    for rid, want in orig.items():
        got = back[rid]
        assert got["name"] == want["name"]
        assert got["price"] == want["price"]
        assert got["provider"] == want["provider"]

    # Java double rendering: 5.0 not 5, 12.5 not 12.50
    df = spark.createDataFrame(
        [(1, "n", "", "", "", "", 5.0, "", "", "p", "t"),
         (2, "n", "", "", "", "", 12.5, "", "", "p", "t")],
        ["id", "name", "sku", "description", "image_url", "prod_url",
         "price", "currency", "availability", "provider", "time_stamp"],
    )
    vals = {r["value"] for r in to_reference_lines(df).collect()}
    assert any("<5.0>" in v for v in vals)
    assert any("<12.5>" in v for v in vals)
