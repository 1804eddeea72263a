"""Round-trip tests for the GeoJSON <-> ISO WKB codec, including a
hypothesis property test over random polygons."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stac_geoparquet_spark.geom import geojson_to_wkb, wkb_to_geojson

GEOMS = [
    {"type": "Point", "coordinates": [-105.2, 40.1]},
    {"type": "Point", "coordinates": [-105.2, 40.1, 1650.5]},
    {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0], [2.5, -3.5]]},
    {
        "type": "Polygon",
        "coordinates": [
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
            [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]],
        ],
    },
    {"type": "MultiPoint", "coordinates": [[0.0, 0.0], [1.5, 2.5]]},
    {
        "type": "MultiLineString",
        "coordinates": [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]],
    },
    {
        "type": "MultiPolygon",
        "coordinates": [
            [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
            [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]],
        ],
    },
    {
        "type": "GeometryCollection",
        "geometries": [
            {"type": "Point", "coordinates": [1.0, 2.0]},
            {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
        ],
    },
]


@pytest.mark.parametrize("geom", GEOMS, ids=lambda g: g["type"])
def test_roundtrip_exact(geom):
    wkb = geojson_to_wkb(geom)
    assert isinstance(wkb, bytes) and wkb[0] == 1
    back = wkb_to_geojson(wkb)
    assert back == geom


def test_none_passthrough():
    assert geojson_to_wkb(None) is None
    assert wkb_to_geojson(None) is None


def test_json_string_input():
    wkb = geojson_to_wkb('{"type": "Point", "coordinates": [1.0, 2.0]}')
    assert wkb_to_geojson(wkb) == {"type": "Point", "coordinates": [1.0, 2.0]}


def test_empty_multipolygon_part_dropped():
    # reference parity: utils.py:89-101 filters empty MultiPolygon parts
    geom = {
        "type": "MultiPolygon",
        "coordinates": [
            [],
            [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
        ],
    }
    back = wkb_to_geojson(geojson_to_wkb(geom))
    assert back["coordinates"] == [
        [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]]
    ]


def test_3d_type_codes_iso():
    wkb = geojson_to_wkb({"type": "Point", "coordinates": [1.0, 2.0, 3.0]})
    # ISO Z code = 1001 little-endian after the byte-order byte
    assert int.from_bytes(wkb[1:5], "little") == 1001


def test_big_endian_decode():
    import struct

    data = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 3.0, 4.0)
    assert wkb_to_geojson(data) == {"type": "Point", "coordinates": [3.0, 4.0]}


finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.tuples(finite, finite), min_size=4, max_size=10),
        min_size=1,
        max_size=4,
    )
)
def test_polygon_property_roundtrip(rings):
    geom = {
        "type": "Polygon",
        "coordinates": [[list(pt) for pt in ring] for ring in rings],
    }
    back = wkb_to_geojson(geojson_to_wkb(geom))
    for r1, r2 in zip(geom["coordinates"], back["coordinates"]):
        for p1, p2 in zip(r1, r2):
            assert all(
                math.isclose(a, b, rel_tol=0, abs_tol=0) for a, b in zip(p1, p2)
            )


def test_ewkb_srid_flag_decodes():
    """PostGIS/pgstac emit EWKB with the SRID flag (0x20000000); the
    decoder must consume the 4-byte SRID and strip the flag bits
    (round-2 fix: 2-D SRID input raised 'unknown WKB geometry code',
    Z+SRID silently decoded garbage coordinates)."""
    import struct

    from stac_geoparquet_spark.geom.wkb import wkb_to_geojson

    two_d = bytes.fromhex("0101000020E6100000") + struct.pack("<2d", 1.5, 2.5)
    assert wkb_to_geojson(two_d) == {
        "type": "Point",
        "coordinates": [1.5, 2.5],
    }
    z_srid = bytes.fromhex("01010000A0E6100000") + struct.pack(
        "<3d", 1.0, 2.0, 3.0
    )
    assert wkb_to_geojson(z_srid) == {
        "type": "Point",
        "coordinates": [1.0, 2.0, 3.0],
    }
    # M flag: the M ordinate is consumed and dropped (GeoJSON has no M)
    m_flag = bytes.fromhex("0101000040") + struct.pack("<3d", 1.0, 2.0, 9.9)
    assert wkb_to_geojson(m_flag) == {
        "type": "Point",
        "coordinates": [1.0, 2.0],
    }
    # ISO ZM code 3001: four ordinates stored, x/y/z kept
    zm = b"\x01" + struct.pack("<I", 3001) + struct.pack(
        "<4d", 1.0, 2.0, 3.0, 9.9
    )
    assert wkb_to_geojson(zm) == {
        "type": "Point",
        "coordinates": [1.0, 2.0, 3.0],
    }


def test_empty_point_encode_raises_clearly():
    import pytest

    from stac_geoparquet_spark.geom.wkb import geojson_to_wkb

    with pytest.raises(ValueError, match="empty Point"):
        geojson_to_wkb({"type": "Point", "coordinates": []})
