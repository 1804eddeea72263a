"""Generative STAC round-trip: hypothesis draws a random-but-
consistent item schema (property fields with types, asset keys, link
shapes, geometry kind, 2-D/3-D bbox) plus random rows obeying it, and
the full forward (read_items: T1-T5) + inverse (to_item_dicts:
U1-U5) pipeline must reproduce the items under null≡missing JSON
semantics. This covers shapes the fixed fixtures can't enumerate —
per-row nulls in any field, int-vs-float property mixes (permissive
widening), missing assets on some rows, 3-D bboxes.

Each example costs a Spark inference read + collect, so examples are
few and the strategy compact; determinism-sensitive floats are drawn
from a finite grid to keep JSON text stable across the round trip.
"""

from __future__ import annotations

import json

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# finite grids: float JSON round-trip text stability
COORD = st.sampled_from([-100.0, -50.25, 0.0, 10.5, 45.125, 179.875])
NUM = st.sampled_from([0, 1, 7, -3, 2.5, 100.125, -0.5])
WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "x y", ""])
PROP_TYPES = ("int", "float", "str", "bool")


@st.composite
def item_batch(draw):
    n_items = draw(st.integers(1, 4))
    n_props = draw(st.integers(0, 3))
    prop_spec = {
        f"p{i}": draw(st.sampled_from(PROP_TYPES)) for i in range(n_props)
    }
    asset_keys = draw(
        st.lists(st.sampled_from(["image", "thumb", "meta"]), unique=True,
                 max_size=2)
    )
    three_d = draw(st.booleans())

    def value(kind):
        if kind == "int":
            return draw(st.integers(-1000, 1000))
        if kind == "float":
            return draw(NUM) + 0.0
        if kind == "str":
            return draw(WORD)
        return draw(st.booleans())

    items = []
    for i in range(n_items):
        x = draw(COORD)
        y = draw(COORD)
        props = {"datetime": f"2024-06-{10 + i:02d}T0{i}:00:00Z"}
        for name, kind in prop_spec.items():
            if draw(st.booleans()):  # per-row missing allowed
                props[name] = value(kind)
        geom = {
            "type": "Point",
            "coordinates": [x, y],
        } if draw(st.booleans()) else {
            "type": "Polygon",
            "coordinates": [[[x, y], [x + 1.0, y], [x + 1.0, y + 1.0],
                             [x, y + 1.0], [x, y]]],
        }
        bbox = [x, y, x + 1.0, y + 1.0]
        if three_d:
            bbox = [x, y, 0.0, x + 1.0, y + 1.0, 10.0]
        item = {
            "type": "Feature",
            "stac_version": "1.0.0",
            "id": f"item-{i:03d}",
            "collection": "gen",
            "geometry": geom,
            "bbox": bbox,
            "links": [
                {"href": f"https://example.com/{i}", "rel": "self",
                 "type": "application/geo+json"}
            ],
            "assets": {
                k: {"href": f"https://example.com/{k}/{i}", "roles": ["data"]}
                for k in asset_keys
                if draw(st.booleans())  # per-row missing assets
            },
            "properties": props,
        }
        items.append(item)
    return items


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(item_batch())
def test_generated_items_roundtrip(spark, tmp_path_factory, items):
    from tests.json_semantic import items_equal

    from stac_geoparquet_spark.stac import read_items, to_item_dicts

    src = str(
        tmp_path_factory.mktemp("gen_stac") / "items.ndjson"
    )
    with open(src, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    df = read_items(spark, src)
    back = sorted(to_item_dicts(df), key=lambda d: d["id"])
    orig = sorted(items, key=lambda d: d["id"])
    ok, msg = items_equal(orig, back)
    assert ok, msg


def test_null_geometry_items_roundtrip(spark, tmp_path):
    """STAC allows geometry = null (with bbox null); the WKB encode /
    decode walk and the bbox struct conversion must pass the NULLs
    through losslessly next to normal items."""
    from tests.json_semantic import items_equal

    from stac_geoparquet_spark.stac import read_items, to_item_dicts

    items = [
        {
            "type": "Feature",
            "stac_version": "1.0.0",
            "id": "geom-null",
            "collection": "c",
            "geometry": None,
            "bbox": None,
            "links": [],
            "assets": {},
            "properties": {"datetime": "2024-06-01T00:00:00Z"},
        },
        {
            "type": "Feature",
            "stac_version": "1.0.0",
            "id": "geom-ok",
            "collection": "c",
            "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
            "bbox": [1.0, 2.0, 1.0, 2.0],
            "links": [],
            "assets": {},
            "properties": {"datetime": "2024-06-02T00:00:00Z"},
        },
    ]
    src = str(tmp_path / "items.ndjson")
    with open(src, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    back = sorted(to_item_dicts(read_items(spark, src)), key=lambda d: d["id"])
    ok, msg = items_equal(sorted(items, key=lambda d: d["id"]), back)
    assert ok, msg
