"""Schema strategies (§1.3), permissive union, null patching, Delta
null-guard (K2), and self-link extraction (L2)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stac_geoparquet_spark.sinks import delta as delta_sink
from stac_geoparquet_spark.stac import schema as S
from stac_geoparquet_spark.stac.forward import extract_self_link


# ---------------------------------------------------------------------------
# widening union
# ---------------------------------------------------------------------------
def test_merge_numeric_widening():
    assert S.merge_types(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert S.merge_types(T.IntegerType(), T.LongType()) == T.LongType()


def test_merge_null_yields():
    assert S.merge_types(T.NullType(), T.StringType()) == T.StringType()


def test_merge_struct_union_recursive():
    a = T.StructType(
        [
            T.StructField("x", T.LongType()),
            T.StructField("s", T.StructType([T.StructField("p", T.NullType())])),
        ]
    )
    b = T.StructType(
        [
            T.StructField("y", T.StringType()),
            T.StructField(
                "s", T.StructType([T.StructField("p", T.DoubleType())])
            ),
        ]
    )
    m = S.merge_types(a, b)
    assert {f.name for f in m.fields} == {"x", "y", "s"}
    assert m["s"].dataType["p"].dataType == T.DoubleType()


def test_merge_irreconcilable_falls_back_to_string():
    assert (
        S.merge_types(T.LongType(), T.BooleanType()) == T.StringType()
    )


def test_merge_arrays():
    assert S.merge_types(
        T.ArrayType(T.IntegerType()), T.ArrayType(T.DoubleType())
    ) == T.ArrayType(T.DoubleType())


# ---------------------------------------------------------------------------
# null patch (manual_updates port)
# ---------------------------------------------------------------------------
def test_patch_null_types():
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField(
                "properties",
                T.StructType(
                    [
                        T.StructField("datetime", T.NullType()),
                        T.StructField("proj:epsg", T.NullType()),
                        T.StructField("proj:wkt2", T.NullType()),
                        T.StructField("whatever", T.NullType()),
                    ]
                ),
            ),
        ]
    )
    p = S.patch_null_types(schema)
    props = p["properties"].dataType
    assert props["datetime"].dataType == T.TimestampType()
    assert props["proj:epsg"].dataType == T.LongType()
    assert props["proj:wkt2"].dataType == T.StringType()
    assert props["whatever"].dataType == T.StringType()


# ---------------------------------------------------------------------------
# the three strategies over real files
# ---------------------------------------------------------------------------
def _write_chunks(tmp_path):
    c1 = tmp_path / "chunk1.ndjson"
    c2 = tmp_path / "chunk2.ndjson"
    c1.write_text(
        json.dumps({"id": "a", "properties": {"gsd": 1, "datetime": None}})
        + "\n"
    )
    c2.write_text(
        json.dumps({"id": "b", "properties": {"gsd": 1.5, "extra": "x"}})
        + "\n"
    )
    return [str(c1), str(c2)]


def test_full_file_sees_all_fields(spark, tmp_path):
    paths = _write_chunks(tmp_path)
    sc = S.infer_items_schema(spark, paths, S.FULL_FILE)
    props = sc["properties"].dataType
    assert {f.name for f in props.fields} == {"gsd", "datetime", "extra"}
    assert props["gsd"].dataType == T.DoubleType()
    # Spark's JSON inference types all-null fields as string (T3 types
    # them later); NullType — and therefore the patch — arises on the
    # createDataFrame/Arrow ingestion paths
    assert props["datetime"].dataType == T.StringType()


def test_first_batch_sees_only_first_chunk(spark, tmp_path):
    paths = _write_chunks(tmp_path)
    sc = S.infer_items_schema(spark, paths, S.FIRST_BATCH)
    props = sc["properties"].dataType
    assert {f.name for f in props.fields} == {"gsd", "datetime"}
    assert props["gsd"].dataType == T.LongType()


def test_chunks_to_disk_merges_per_chunk(spark, tmp_path):
    paths = _write_chunks(tmp_path)
    sc = S.infer_items_schema(spark, paths, S.CHUNKS_TO_DISK)
    props = sc["properties"].dataType
    assert {f.name for f in props.fields} == {"gsd", "datetime", "extra"}
    assert props["gsd"].dataType == T.DoubleType()  # widened long -> double


def test_unknown_strategy_rejected(spark):
    with pytest.raises(ValueError):
        S.infer_items_schema(spark, ["x"], "Whatever")


# ---------------------------------------------------------------------------
# Delta sink null-guard (K2)
# ---------------------------------------------------------------------------
def test_delta_rejects_null_typed_columns(spark):
    df = spark.range(1).withColumn("bad", F.lit(None))
    with pytest.raises(ValueError, match="null-typed"):
        delta_sink.to_delta(df, "/tmp/never-written")


def test_delta_unavailable_is_reported(spark):
    df = spark.range(1).withColumn("ok", F.lit("x"))
    if delta_sink.delta_available(spark):  # pragma: no cover - env-dependent
        pytest.skip("delta available here")
    with pytest.raises(RuntimeError, match="delta-spark"):
        delta_sink.to_delta(df, "/tmp/never-written")


def test_null_typed_column_paths_nested():
    schema = T.StructType(
        [
            T.StructField("a", T.NullType()),
            T.StructField(
                "s", T.StructType([T.StructField("b", T.NullType())])
            ),
            T.StructField("arr", T.ArrayType(T.NullType())),
        ]
    )
    assert delta_sink._null_typed_columns(schema) == ["a", "s.b", "arr[]"]


# ---------------------------------------------------------------------------
# self-link (L2)
# ---------------------------------------------------------------------------
def test_extract_self_link(spark):
    rows = [
        (
            "a",
            [
                {"rel": "parent", "href": "https://api/x", "type": None},
                {
                    "rel": "self",
                    "href": "https://api/items/a",
                    "type": "application/geo+json",
                },
            ],
        ),
        ("b", [{"rel": "self", "href": "/relative/path", "type": None}]),
        ("c", []),
    ]
    schema = (
        "id string, links array<struct<rel string, href string, type string>>"
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r.id: r.self_link for r in extract_self_link(df).collect()
    }
    assert got == {"a": "https://api/items/a", "b": None, "c": None}


def test_extract_self_link_no_links_column(spark):
    df = spark.range(1)
    out = extract_self_link(df)
    assert out.schema["self_link"].dataType == T.StringType()


def test_merge_int_and_float_widens_to_double():
    """int64 + float32 must merge to float64 (float32 silently rounds
    integers above 2^24), matching pyarrow's permissive promotion."""
    from pyspark.sql import types as T

    from stac_geoparquet_spark.stac.schema import merge_types

    assert merge_types(T.LongType(), T.FloatType()) == T.DoubleType()
    assert merge_types(T.FloatType(), T.IntegerType()) == T.DoubleType()
    assert merge_types(T.FloatType(), T.FloatType()) == T.FloatType()
    assert merge_types(T.LongType(), T.DoubleType()) == T.DoubleType()
