"""CQL2-text parser tests: text expressions must produce the same AST
(and therefore the same rows) as their CQL2-JSON equivalents.

Reference context: the reference forwards pgstac search dicts opaquely
(stac_geoparquet/pgstac_reader.py:178-181); pgstac accepts both CQL2
encodings, so the engine's native evaluator gets a text frontend too
(stac_geoparquet_spark/stac/cql2_text.py).
"""

import pytest
from pyspark.sql import functions as F

from stac_geoparquet_spark.stac.cql2 import Cql2Error
from stac_geoparquet_spark.stac.cql2_text import (
    cql2_text_filter,
    parse_cql2_text,
)


@pytest.fixture(scope="module")
def items_df(spark):
    rows = [
        ("a", "s2", 5.0, "2024-06-10T12:00:00Z", "sentinel-2a",
         (-74.5, 40.0, -73.5, 41.0)),
        ("b", "s2", 35.0, "2024-06-20T12:00:00Z", "sentinel-2b",
         (-75.5, 39.0, -74.8, 39.9)),
        ("c", "landsat", 10.0, "2024-07-01T00:00:00Z", "landsat-9",
         (10.0, 45.0, 11.0, 46.0)),
        ("d", "s2", None, "2023-12-31T23:59:59Z", "sentinel-2a",
         (-74.2, 40.5, -73.9, 40.8)),
    ]
    df = spark.createDataFrame(
        rows, "id string, collection string, cloud double, dt string, "
        "platform string, bbox struct<xmin:double,ymin:double,"
        "xmax:double,ymax:double>"
    )
    return df.withColumn("datetime", F.to_timestamp("dt")).drop("dt")


def ids(df, text):
    return sorted(
        r["id"] for r in cql2_text_filter(df, text).select("id").collect()
    )


def test_ast_shapes():
    assert parse_cql2_text("collection = 's2'") == {
        "op": "=", "args": [{"property": "collection"}, "s2"]
    }
    assert parse_cql2_text("a = 1 AND b = 2 OR c = 3") == {
        "op": "or",
        "args": [
            {"op": "and", "args": [
                {"op": "=", "args": [{"property": "a"}, 1]},
                {"op": "=", "args": [{"property": "b"}, 2]},
            ]},
            {"op": "=", "args": [{"property": "c"}, 3]},
        ],
    }
    # parentheses override precedence
    assert parse_cql2_text("a = 1 AND (b = 2 OR c = 3)")["op"] == "and"
    # arithmetic precedence: * binds tighter than +
    assert parse_cql2_text("x + y * 2 > 10") == {
        "op": ">",
        "args": [
            {"op": "+", "args": [
                {"property": "x"},
                {"op": "*", "args": [{"property": "y"}, 2]},
            ]},
            10,
        ],
    }


def test_comparisons_and_logical(items_df):
    assert ids(items_df, "collection = 's2' AND cloud < 20") == ["a"]
    assert ids(items_df, "cloud IS NULL OR NOT collection <> 'landsat'") == [
        "c", "d"
    ]
    assert ids(items_df, "cloud BETWEEN 5 AND 10") == ["a", "c"]
    assert ids(items_df, "cloud NOT BETWEEN 5 AND 10") == ["b"]
    assert ids(items_df, "collection IN ('landsat', 'x')") == ["c"]
    assert ids(items_df, "collection NOT IN ('landsat')") == ["a", "b", "d"]
    assert ids(items_df, "platform LIKE 'sentinel-2%'") == ["a", "b", "d"]
    assert ids(items_df, "platform NOT LIKE 'sentinel-2%'") == ["c"]
    assert ids(items_df, "cloud IS NOT NULL AND cloud * 2 > 60") == ["b"]


def test_string_escape_and_casei(items_df):
    assert parse_cql2_text("name = 'it''s'") == {
        "op": "=", "args": [{"property": "name"}, "it's"]
    }
    assert ids(items_df, "CASEI(platform) = 'landsat-9'") == ["c"]


def test_quoted_property(items_df):
    df = items_df.withColumnRenamed("cloud", "eo:cloud_cover")
    got = sorted(
        r["id"]
        for r in cql2_text_filter(df, '"eo:cloud_cover" < 20').select("id")
        .collect()
    )
    assert got == ["a", "c"]


def test_temporal(items_df):
    assert ids(
        items_df,
        "T_AFTER(datetime, TIMESTAMP('2024-06-15T00:00:00Z'))",
    ) == ["b", "c"]
    assert ids(
        items_df,
        "T_DURING(datetime, INTERVAL('2024-06-01T00:00:00Z',"
        " '2024-06-30T23:59:59Z'))",
    ) == ["a", "b"]
    assert ids(
        items_df,
        "ANYINTERACTS(datetime, INTERVAL('..', '2024-01-01T00:00:00Z'))",
    ) == ["d"]


def test_spatial_bbox_and_wkt(items_df):
    assert ids(
        items_df,
        "S_INTERSECTS(geometry, BBOX(-74.3, 39.95, -73.7, 40.9))",
    ) == ["a", "d"]
    assert ids(
        items_df,
        "S_INTERSECTS(geometry, POLYGON((9.0 44.0, 12.0 44.0, 12.0 47.0,"
        " 9.0 47.0, 9.0 44.0)))",
    ) == ["c"]
    assert ids(
        items_df,
        "S_INTERSECTS(geometry, POINT(10.5 45.5))",
    ) == ["c"]


def test_text_json_equivalence(items_df):
    """Same filter through both frontends selects the same rows."""
    from stac_geoparquet_spark.stac.cql2 import cql2_filter

    text = (
        "collection = 's2' AND cloud < 20 AND "
        "T_AFTER(datetime, TIMESTAMP('2024-01-01T00:00:00Z')) AND "
        "S_INTERSECTS(geometry, BBOX(-74.3, 39.95, -73.7, 40.9))"
    )
    via_text = sorted(
        r["id"] for r in cql2_text_filter(items_df, text).collect()
    )
    via_json = sorted(
        r["id"]
        for r in cql2_filter(items_df, parse_cql2_text(text)).collect()
    )
    assert via_text == via_json == ["a"]


def test_errors():
    for bad in (
        "collection = ",
        "AND x = 1",
        "x ~ 1",
        "T_AFTER(datetime)",
        "S_INTERSECTS(geometry, CIRCLE(0 0))",
        "x = 1 extra junk (",
    ):
        with pytest.raises(Cql2Error):
            parse_cql2_text(bad)


def test_bad_wkt_coordinate_raises_cql2error():
    import pytest

    from stac_geoparquet_spark.stac.cql2 import Cql2Error
    from stac_geoparquet_spark.stac.cql2_text import parse_cql2_text

    with pytest.raises(Cql2Error, match="WKT coordinate"):
        parse_cql2_text("S_INTERSECTS(geometry, POINT(1 a))")
