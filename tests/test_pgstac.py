"""pgstac source family (S5-S8, §2.8) — everything except the JDBC hop
itself, which needs a live Postgres: SQL builders are pure, hydration
runs distributed over injected row DataFrames."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from stac_geoparquet_spark.geom.wkb import geojson_to_wkb
from stac_geoparquet_spark.sources import pgstac

TS = dt.datetime(2024, 1, 1, 0, 0, 0)
TS2 = dt.datetime(2024, 2, 1, 0, 0, 0)


# ---------------------------------------------------------------------------
# S5 — query builder
# ---------------------------------------------------------------------------
def test_items_sql_full_scan():
    assert pgstac.build_items_sql() == (
        "SELECT id, geometry, collection, datetime, end_datetime, content "
        "FROM items"
    )


def test_items_sql_collection_only():
    sql = pgstac.build_items_sql("naip")
    assert sql.endswith("WHERE collection = 'naip'")


def test_items_sql_range():
    sql = pgstac.build_items_sql("naip", TS, TS2)
    assert "datetime >= TIMESTAMP '2024-01-01 00:00:00.000000'" in sql
    assert "datetime < TIMESTAMP '2024-02-01 00:00:00.000000'" in sql


def test_items_sql_open_end_defaults_to_now():
    now = dt.datetime(2025, 6, 1, 12, 0, 0)
    sql = pgstac.build_items_sql("naip", TS, now=now)
    assert "datetime < TIMESTAMP '2025-06-01 12:00:00.000000'" in sql


def test_items_sql_search_form_and_exclusivity():
    assert pgstac.build_items_sql(search='{"op":"and"}').startswith(
        "SELECT * FROM search("
    )
    with pytest.raises(ValueError):
        pgstac.build_items_sql("naip", search="{}")
    with pytest.raises(ValueError):
        pgstac.build_items_sql(start_datetime=TS)
    with pytest.raises(ValueError):
        pgstac.build_items_sql("naip", end_datetime=TS2)


def test_items_sql_quotes_escaped():
    assert "''" in pgstac.build_items_sql("na'ip")


# ---------------------------------------------------------------------------
# S6/S7 — hydration semantics
# ---------------------------------------------------------------------------
def test_hydrate_base_supplies_defaults():
    base = {"assets": {"image": {"type": "image/tiff", "roles": ["data"]}}}
    item = {"assets": {"image": {"href": "s3://x/1.tif"}}}
    out = pgstac.hydrate(base, item)
    assert out["assets"]["image"] == {
        "type": "image/tiff",
        "roles": ["data"],
        "href": "s3://x/1.tif",
    }


def test_hydrate_item_wins_on_conflict():
    assert pgstac.hydrate({"a": 1, "b": 2}, {"a": 9}) == {"a": 9, "b": 2}


def test_hydrate_do_not_merge_sentinel_removes_key():
    base = {"a": 1, "b": {"c": 3}}
    item = {"b": {"c": pgstac.DO_NOT_MERGE}}
    out = pgstac.hydrate(base, item)
    assert out == {"a": 1, "b": {}}


def test_hydrate_elementwise_lists():
    base = {"bands": [{"name": "red"}, {"name": "nir"}]}
    item = {"bands": [{"gain": 1.0}, {"gain": 2.0}]}
    out = pgstac.hydrate(base, item)
    assert out["bands"] == [
        {"name": "red", "gain": 1.0},
        {"name": "nir", "gain": 2.0},
    ]


def test_geojson_bounds():
    geom = {
        "type": "Polygon",
        "coordinates": [[[0.0, 1.0], [2.0, 1.0], [2.0, 5.0], [0.0, 1.0]]],
    }
    assert pgstac.geojson_bounds(geom) == [0.0, 1.0, 2.0, 5.0]
    assert pgstac.geojson_bounds(None) is None


# ---------------------------------------------------------------------------
# S6 distributed: broadcast hydration join + decode
# ---------------------------------------------------------------------------
def _rows_fixture(spark):
    geom = {"type": "Point", "coordinates": [10.0, 20.0]}
    rows = [
        {
            "id": "item-1",
            "geometry": geojson_to_wkb(geom).hex(),
            "collection": "naip",
            "datetime": "2024-01-01T00:00:00Z",
            "end_datetime": None,
            "content": json.dumps(
                {
                    "type": "Feature",
                    "properties": {"datetime": "2024-01-01T00:00:00Z"},
                    "assets": {"image": {"href": "s3://x/1.tif"}},
                }
            ),
        }
    ]
    base = [
        (
            "naip",
            json.dumps(
                {"assets": {"image": {"type": "image/tiff"}}, "links": []}
            ),
        )
    ]
    rows_df = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "id string, geometry string, collection string, datetime string, "
        "end_datetime string, content string",
    )
    base_df = spark.createDataFrame(base, "collection string, base_item string")
    return rows_df, base_df


def test_hydrate_rows_decodes_and_merges(spark):
    rows_df, base_df = _rows_fixture(spark)
    out = pgstac.hydrate_rows(rows_df, base_df)
    items = [json.loads(r.item_json) for r in out.collect()]
    assert len(items) == 1
    item = items[0]
    assert item["id"] == "item-1"
    assert item["collection"] == "naip"
    assert item["geometry"]["type"] == "Point"
    assert item["bbox"] == [10.0, 20.0, 10.0, 20.0]
    # hydrated from base + row content
    assert item["assets"]["image"] == {
        "type": "image/tiff",
        "href": "s3://x/1.tif",
    }


def test_hydrate_rows_row_func_hook(spark):
    rows_df, base_df = _rows_fixture(spark)

    def add_tag(item):
        item["properties"]["tag"] = "x"
        return item

    out = pgstac.hydrate_rows(rows_df, base_df, row_func=add_tag)
    item = json.loads(out.collect()[0].item_json)
    assert item["properties"]["tag"] == "x"


def test_parse_item_strings_roundtrip(spark):
    rows_df, base_df = _rows_fixture(spark)
    parsed = pgstac.parse_item_strings(
        spark, pgstac.hydrate_rows(rows_df, base_df)
    )
    assert parsed.count() == 1
    assert "assets" in parsed.columns and "geometry" in parsed.columns


# ---------------------------------------------------------------------------
# S8 + §2.8 — partitions and incremental sync
# ---------------------------------------------------------------------------
def test_partitions_sql():
    sql = pgstac.build_partitions_sql()
    assert "FROM partitions_view" in sql and sql.endswith(
        "ORDER BY last_updated ASC"
    )
    sql2 = pgstac.build_partitions_sql(dt.datetime(2024, 3, 1))
    assert "last_updated >= TIMESTAMP '2024-03-01 00:00:00.000000'" in sql2


def test_partition_filename_and_range():
    assert (
        pgstac.partition_filename(TS, TS2) == "items_20240101_20240201.parquet"
    )
    lo, hi = pgstac.partition_range(TS, TS2)
    assert lo == TS and hi == TS2 + dt.timedelta(microseconds=1)


def test_sync_partitions_writes_partition_tree(spark, tmp_path):
    parts = [
        {"collection": "naip", "start_datetime": TS, "end_datetime": TS2},
        {
            "collection": "sentinel",
            "start_datetime": TS2,
            "end_datetime": dt.datetime(2024, 3, 1),
        },
    ]

    def read_partition(p):
        return spark.range(3).withColumn("collection", F.lit(p["collection"]))

    out = str(tmp_path / "sync")
    written = pgstac.sync_partitions(parts, read_partition, out)
    assert written == [
        f"{out}/naip/items_20240101_20240201.parquet",
        f"{out}/sentinel/items_20240201_20240301.parquet",
    ]
    for dest in written:
        assert os.path.isdir(dest)
        assert spark.read.parquet(dest).count() == 3
    # idempotent overwrite (the reference re-exports whole partitions)
    written2 = pgstac.sync_partitions(parts[:1], read_partition, out)
    assert spark.read.parquet(written2[0]).count() == 3


def test_sync_partitions_transform_hook(spark, tmp_path):
    """transform= mirrors the reference's per-item row_func
    (pgstac_reader.py:164) as a vectorized DataFrame hook: applied to
    every partition before the write."""
    parts = [
        {"collection": "naip", "start_datetime": TS, "end_datetime": TS2},
    ]

    def read_partition(p):
        return spark.range(3).withColumn("collection", F.lit(p["collection"]))

    out = str(tmp_path / "sync_tx")
    written = pgstac.sync_partitions(
        parts,
        read_partition,
        out,
        transform=lambda df: df.filter(F.col("id") > 0).withColumn(
            "tagged", F.lit(True)
        ),
    )
    back = spark.read.parquet(written[0])
    assert back.count() == 2
    assert back.filter(~F.col("tagged")).count() == 0
