"""Quad-block -> entity routing parity (ConvertionToEntities.java:62-183):
else-if branch routing, first-wins vs last-wins fields, provider/timestamp
from the key, Offer-inherits-Product with single-consumption, scope isolation
by part column."""

from __future__ import annotations

import pytest

from microdeduplication_spark.operators.entity_routing import (
    as_product_lines,
    route_quad_blocks,
)

P = "<http://schema.org/Product>"
O = "<http://schema.org/Offer>"


def _blocks():
    return [
        # part 0, pos 1: Product -- emits nothing, becomes the pending map
        (0, 1, "\n".join([
            P,
            # malformed (3 fields): contributes nothing, not even ts/provider
            "<bad::key::t0::q>, <n1>, <http://schema.org/Product/name>",
            "<http://s.ee::shop.ee::20160101::q>, <n1>, "
            "<http://schema.org/Product/name>, <Red Bike>",
            # first-wins: ignored
            "<k::h::t::q>, <n1>, <http://schema.org/Product/name>, <SECOND>",
            "<k>, <n1>, <http://schema.org/Product/image>, <img1>",
            # last-wins: img2 overwrites img1
            "<k>, <n1>, <http://schema.org/Product/image>, <img2>",
            "<k>, <n1>, <http://schema.org/Product/sku>, <sku9>",
        ])),
        # part 0, pos 2: first Offer -- inherits the map and consumes it
        (0, 2, "\n".join([
            O,
            "<http://o.ee::offer.ee::20170101::q>, <n2>, "
            "<http://schema.org/Offer/price>, <9,99>",
            # contains Offer/price -> captured by the PRICE branch (quirk);
            # price already set, so it is a no-op and currency stays empty
            "<k>, <n2>, <http://schema.org/Offer/priceCurrency>, <EUR>",
            # last-wins field: the offer's own line overrides inherited sku9
            "<k>, <n2>, <http://schema.org/Product/sku>, <offersku>",
        ])),
        # part 0, pos 3: second Offer -- map already consumed, no inherit
        (0, 3, "\n".join([
            O,
            "<http://o2.ee::late.ee::20180101::q>, <n3>, "
            "<http://schema.org/Offer/itemOffered>, <Late Offer>",
            # Offer/currency (not priceCurrency) reaches the currency branch
            "<k>, <n3>, <http://schema.org/Offer/currency>, <USD>",
        ])),
        # part 0, pos 4 + 5: two Products back-to-back -- second overwrites
        (0, 4, P + "\n<kk::hh::tt::q>, <n4>, "
                   "<http://schema.org/Product/name>, <Thing>"),
        (0, 5, P + "\n<k3::h3::t3::q>, <n5>, "
                   "<http://schema.org/Product/name>, <Thing3>"),
        # part 0, pos 6: Offer inherits from the NEAREST product (pos 5)
        (0, 6, O + "\n<x::y::z::q>, <n6>, "
                   "<http://schema.org/Offer/price>, <5>"),
        # part 1, pos 1: Offer with no preceding product in ITS part scope
        (1, 1, O + "\n<a::b::c::q>, <n7>, "
                   "<http://schema.org/Offer/itemOffered>, <Lonely>"),
    ]


@pytest.fixture(scope="module")
def routed(spark):
    df = spark.createDataFrame(_blocks(), ["part", "pos", "block"])
    return {
        (r["part"], r["id"]): r.asDict()
        for r in route_quad_blocks(df).collect()
    }


def test_products_do_not_emit(routed):
    assert set(routed) == {(0, 2), (0, 3), (0, 6), (1, 1)}


def test_offer_inherits_product(routed):
    r = routed[(0, 2)]
    assert r["name"] == "Red Bike"          # inherited, first-wins
    assert r["image_url"] == "img2"         # inherited (product last-wins)
    assert r["sku"] == "offersku"           # own last-wins beats inherited
    assert r["price"] == "9,99"             # own (product had no price)
    assert r["currency"] == ""              # priceCurrency swallowed by price branch
    assert r["provider"] == "http://s.eeshop.ee"   # key part0+part1, inherited
    assert r["time_stamp"] == "20160101"    # inherited beats own 20170101


def test_map_consumed_once(routed):
    r = routed[(0, 3)]
    assert r["name"] == "Late Offer"        # own itemOffered, nothing inherited
    assert r["sku"] == "" and r["image_url"] == ""
    assert r["currency"] == "USD"           # Offer/currency reaches its branch
    assert r["provider"] == "http://o2.eelate.ee"
    assert r["time_stamp"] == "20180101"


def test_nearest_product_wins(routed):
    r = routed[(0, 6)]
    assert r["name"] == "Thing3"
    assert r["provider"] == "k3h3"
    assert r["time_stamp"] == "t3"


def test_part_scope_isolated(routed):
    r = routed[(1, 1)]
    assert r["name"] == "Lonely"
    assert r["provider"] == "ab"            # own key, nothing leaks across parts


def test_as_product_lines_roundtrip(spark):
    from microdeduplication_spark.operators.entity_formation import (
        parse_product_lines,
    )

    df = spark.createDataFrame(_blocks(), ["part", "pos", "block"])
    lines = as_product_lines(route_quad_blocks(df))
    parsed = {r["id"]: r for r in parse_product_lines(lines).collect()}
    assert parsed[2]["name"] == "Red Bike"
    assert parsed[2]["price"] == pytest.approx(9.99)  # comma-coerced
    assert parsed[3]["currency"] == "USD"


def test_dual_type_block_chains_inheritance(spark):
    """A block with BOTH type markers consumes the pending map, stores its
    post-inherit merge, and emits nothing -- so Product fields chain
    through it into the next Offer (ConvertionToEntities.java:80-94 +
    :130-143; round-3 deviation closed)."""
    rows = [
        # pos 1: Product (name + sku) -> pending map
        (0, 1, "\n".join([
            P,
            "<http://s.ee::shop.ee::20160101::q>, <n>, "
            "<http://schema.org/Product/name>, <Chained Bike>",
            "<k>, <n>, <http://schema.org/Product/sku>, <sku1>",
        ])),
        # pos 2: dual block -- consumes the map, merges its own price +
        # sku (last-wins: own sku2 overrides inherited sku1), emits NOTHING
        (0, 2, "\n".join([
            P, O,
            "<http://d.ee::dual.ee::20170101::q>, <n>, "
            "<http://schema.org/Offer/price>, <5,55>",
            "<k>, <n>, <http://schema.org/Product/sku>, <sku2>",
        ])),
        # pos 3: Offer inherits the MERGED map (name from pos 1 through the
        # chain, price+sku from pos 2); own description is its own
        (0, 3, "\n".join([
            O,
            "<k>, <n>, <http://schema.org/Offer/description>, <fresh>",
        ])),
        # pos 4: second Offer -- map was consumed at pos 3, nothing inherits
        (0, 4, "\n".join([
            O,
            "<k>, <n>, <http://schema.org/Offer/price>, <7,77>",
        ])),
    ]
    df = spark.createDataFrame(rows, ["part", "pos", "block"])
    out = {r["id"]: r for r in route_quad_blocks(df).collect()}
    assert sorted(out) == [3, 4]  # product and dual blocks emit nothing
    o3 = out[3]
    assert o3["name"] == "Chained Bike"      # chained through the dual block
    assert o3["price"] == "5,55"             # assigned inside the chain
    assert o3["sku"] == "sku2"               # dual's last-wins beat sku1
    assert o3["description"] == "fresh"      # offer's own field intact
    assert o3["provider"] == "http://s.eeshop.ee"  # earliest harvest wins
    assert o3["time_stamp"] == "20160101"
    o4 = out[4]
    assert o4["name"] == "" and o4["sku"] == ""    # single consumption
    assert o4["price"] == "7,77"
