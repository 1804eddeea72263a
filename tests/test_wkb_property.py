"""Property-based round-trip tests for the pure-python WKB codec
(geom/wkb.py) — beyond the reference's fixture-only test strategy
(SURVEY.md §5: the reference has no randomized testing). Hypothesis
generates arbitrary valid GeoJSON geometries (all 7 types, 2-D and
3-D, nested collections) and asserts geojson -> WKB -> geojson is the
identity up to float equality."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from stac_geoparquet_spark.geom.wkb import geojson_to_wkb, wkb_to_geojson

# finite coordinates that survive float64 round-trip exactly
coord = st.floats(
    min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False
)


def position(ndim: int):
    return st.tuples(*([coord] * ndim)).map(list)


def ring(ndim: int):
    # a closed linear ring: >= 4 positions, first == last
    return st.lists(position(ndim), min_size=3, max_size=6).map(
        lambda ps: ps + [ps[0]]
    )


def geometry(ndim: int, depth: int = 0):
    pt = st.fixed_dictionaries(
        {"type": st.just("Point"), "coordinates": position(ndim)}
    )
    mpt = st.fixed_dictionaries(
        {
            "type": st.just("MultiPoint"),
            "coordinates": st.lists(position(ndim), min_size=1, max_size=4),
        }
    )
    ls = st.fixed_dictionaries(
        {
            "type": st.just("LineString"),
            "coordinates": st.lists(position(ndim), min_size=2, max_size=5),
        }
    )
    mls = st.fixed_dictionaries(
        {
            "type": st.just("MultiLineString"),
            "coordinates": st.lists(
                st.lists(position(ndim), min_size=2, max_size=4),
                min_size=1,
                max_size=3,
            ),
        }
    )
    poly = st.fixed_dictionaries(
        {
            "type": st.just("Polygon"),
            "coordinates": st.lists(ring(ndim), min_size=1, max_size=3),
        }
    )
    mpoly = st.fixed_dictionaries(
        {
            "type": st.just("MultiPolygon"),
            "coordinates": st.lists(
                st.lists(ring(ndim), min_size=1, max_size=2),
                min_size=1,
                max_size=2,
            ),
        }
    )
    base = st.one_of(pt, mpt, ls, mls, poly, mpoly)
    if depth >= 1:
        return base
    gc = st.fixed_dictionaries(
        {
            "type": st.just("GeometryCollection"),
            "geometries": st.lists(
                geometry(ndim, depth + 1), min_size=0, max_size=3
            ),
        }
    )
    return st.one_of(base, gc)


def _assert_geom_equal(a, b):
    assert type(a) is type(b), (a, b)
    if isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            _assert_geom_equal(a[k], b[k])
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            _assert_geom_equal(x, y)
    elif isinstance(a, float):
        assert math.isclose(a, b, rel_tol=0, abs_tol=0) or a == b
    else:
        assert a == b


@settings(max_examples=150, deadline=None)
@given(geom=geometry(2))
def test_roundtrip_2d(geom):
    back = wkb_to_geojson(geojson_to_wkb(geom))
    _assert_geom_equal(back, geom)


@settings(max_examples=150, deadline=None)
@given(geom=geometry(3))
def test_roundtrip_3d(geom):
    back = wkb_to_geojson(geojson_to_wkb(geom))
    _assert_geom_equal(back, geom)


def test_none_passthrough():
    assert geojson_to_wkb(None) is None
    assert wkb_to_geojson(None) is None
