"""Parity round-trips over the REFERENCE'S OWN test fixtures.

The reference's primary oracle is items -> Arrow -> items equality over
13 real-world collections (reference tests/test_arrow.py:25-57). This
suite runs the same check through OUR pipeline: each fixture JSON array
at /root/reference/tests/data/<collection>-pc.json (read-only, consumed
at runtime — nothing is copied into this repo) goes forward
(normalize_items) and back (to_item_dicts), and must compare equal
under the semantic comparator (null≡missing, RFC3339 equivalence,
exact numerics — tests/json_semantic.py, mirroring reference
tests/json_equals.py:10-167).

Skipped entirely when the reference checkout is absent, so the repo
stays standalone.
"""

from __future__ import annotations

import json
import os

import pytest

REF_DATA = "/root/reference/tests/data"

# Collections whose raw JSON the reference itself round-trips
# (reference tests/test_arrow.py:25-44 lists the same set).
COLLECTIONS = [
    "3dep-lidar-copc-pc",
    "3dep-lidar-dsm-pc",
    "cop-dem-glo-30-pc",
    "io-lulc-annual-v02-pc",
    "io-lulc-pc",
    "landsat-c2-l1-pc",
    "landsat-c2-l2-pc",
    "naip-pc",
    "planet-nicfi-analytic-pc",
    "sentinel-1-rtc-pc",
    "sentinel-2-l2a-pc",
    "us-census-pc",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference checkout not present"
)


def _load(name: str) -> list[dict]:
    with open(os.path.join(REF_DATA, f"{name}.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("name", COLLECTIONS)
def test_reference_fixture_roundtrip(spark, tmp_path, name):
    from tests.json_semantic import items_equal

    from stac_geoparquet_spark.stac import read_items, to_item_dicts

    items = _load(name)
    src = str(tmp_path / f"{name}.ndjson")
    with open(src, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")

    df = read_items(spark, src)
    back = sorted(to_item_dicts(df), key=lambda d: d["id"])
    orig = sorted(items, key=lambda d: d["id"])
    ok, msg = items_equal(orig, back)
    assert ok, f"{name}: {msg}"


def test_umbra_sar_start_end_datetimes(spark, tmp_path):
    """umbra-sar.json is the reference's non-PlanetaryComputer fixture
    with null datetime + start/end datetimes (its test_arrow edge
    case); the null-type patch must keep the column typed."""
    from tests.json_semantic import items_equal

    from stac_geoparquet_spark.stac import read_items, to_item_dicts

    items = _load("umbra-sar")
    src = str(tmp_path / "umbra.ndjson")
    with open(src, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    df = read_items(spark, src)
    assert dict(df.dtypes).get("datetime") == "timestamp"
    back = sorted(to_item_dicts(df), key=lambda d: d["id"])
    ok, msg = items_equal(sorted(items, key=lambda d: d["id"]), back)
    assert ok, msg


def test_reference_golden_parquet_readback(spark):
    """The reference's legacy-writer golden file (tests/data/naip.parquet,
    produced by its to_geodataframe/to_parquet path) must read straight
    into our inverse pipeline: WKB geometry decodes, flattened
    properties re-nest, array bbox passes through, assets stay a
    struct-of-structs keyed by asset name."""
    from stac_geoparquet_spark.stac.inverse import to_item_dicts

    df = spark.read.parquet(os.path.join(REF_DATA, "naip.parquet"))
    items = list(to_item_dicts(df))
    assert len(items) == df.count() > 0
    for it in items:
        assert it["type"] == "Feature"
        assert it["geometry"]["type"] == "Polygon"
        ring = it["geometry"]["coordinates"][0]
        assert ring[0] == ring[-1] and len(ring) >= 4
        assert len(it["bbox"]) == 4
        props = it["properties"]
        assert "datetime" in props and "naip:year" in props
        assert "image" in it["assets"]
        assert it["assets"]["image"]["href"].startswith("https://")
        # no top-level property leakage: everything non-core is nested
        assert "gsd" not in it and "proj:epsg" not in it
