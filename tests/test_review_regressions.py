"""Regressions for the round-2 STAC/sink review findings: idempotent
GeoParquet rewrites, Spark-SQL string-literal escaping, explicit-schema
FeatureCollection reads, nested/casei CQL2 operands, and idempotent
property re-nesting."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F


def _items(n=3):
    return [
        {
            "type": "Feature",
            "stac_version": "1.0.0",
            "id": f"i{k}",
            "collection": "c",
            "geometry": {"type": "Point", "coordinates": [float(k), 0.0]},
            "bbox": [float(k), 0.0, float(k), 0.0],
            "links": [],
            "assets": {"image": {"href": f"https://x/{k}.tif"}},
            "properties": {"datetime": "2024-06-01T00:00:00Z", "gsd": k + 0.5},
        }
        for k in range(n)
    ]


def _write_ndjson(items, path):
    with open(path, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    return str(path)


def test_to_geoparquet_rerun_is_idempotent(spark, tmp_path):
    """A rerun/retry must REPLACE the dataset, not silently double it
    with new uuid-named part files; append and error modes are explicit
    opt-ins."""
    from stac_geoparquet_spark.sinks.geoparquet import (
        read_geoparquet,
        to_geoparquet,
    )
    from stac_geoparquet_spark.stac import read_items

    src = _write_ndjson(_items(4), tmp_path / "items.ndjson")
    df = read_items(spark, src)
    dest = str(tmp_path / "out")
    to_geoparquet(df, dest)
    to_geoparquet(df, dest)  # rerun: same row count
    assert read_geoparquet(spark, dest).count() == 4
    to_geoparquet(df, dest, mode="append")
    assert read_geoparquet(spark, dest).count() == 8
    with pytest.raises(FileExistsError):
        to_geoparquet(df, dest, mode="error")


@pytest.mark.parametrize(
    "nasty",
    [
        'say "hi"',
        "it's a 'quote'",
        "back\\slash and \\\" mix",
        "newline\nand\ttab",
        '{"nested": "json \\"inside\\""}',
    ],
)
def test_sql_string_literal_roundtrip(spark, nasty):
    """The Delta TBLPROPERTIES escaping must survive Spark's SQL
    parser exactly — json.dumps output is full of backslash escapes
    that naive quote-doubling corrupted."""
    from stac_geoparquet_spark.sinks.delta import sql_string_literal

    payload = json.dumps({"description": nasty})
    got = spark.sql(
        f"SELECT '{sql_string_literal(payload)}' AS v"
    ).first()["v"]
    assert got == payload
    assert json.loads(got) == {"description": nasty}


def test_feature_collection_with_explicit_item_schema(spark, tmp_path):
    """An explicit schema describes an ITEM (infer_items_schema's
    output shape); the FeatureCollection path must wrap it into the
    envelope instead of applying it to the wrapper document."""
    from stac_geoparquet_spark.stac import read_items
    from stac_geoparquet_spark.stac.schema import infer_items_schema

    items = _items(3)
    nd = _write_ndjson(items, tmp_path / "items.ndjson")
    fc = str(tmp_path / "fc.json")
    with open(fc, "w") as f:
        json.dump(
            {"type": "FeatureCollection", "features": items}, f, indent=2
        )
    schema = infer_items_schema(spark, [nd])
    out = read_items(spark, fc, schema=schema)
    assert out.count() == 3
    assert sorted(r["id"] for r in out.select("id").collect()) == [
        "i0",
        "i1",
        "i2",
    ]


def test_sniff_featurecollection_features_first(spark, tmp_path):
    """A pretty-printed FC whose 'features' key precedes 'type' (and
    whose items push 'type' beyond the head) must still classify as a
    FeatureCollection — the key-shaped regex, not a 40-line substring,
    decides."""
    from stac_geoparquet_spark.stac import read_items

    fc = str(tmp_path / "fc2.json")
    doc = {"features": _items(30), "type": "FeatureCollection"}
    with open(fc, "w") as f:
        json.dump(doc, f, indent=2)  # 'features' first, type at the end
    assert read_items(spark, fc).count() == 30


def test_cql2_nested_property_path(spark):
    """Dotted property refs resolve as NESTED paths (assets.image.href)
    while special-char segments stay backtick-quoted."""
    from stac_geoparquet_spark.stac.cql2 import cql2_filter

    df = spark.createDataFrame(
        [(1, (("https://x/a.tif",),)), (2, (("https://y/b.tif",),))],
        "id bigint, assets struct<image:struct<href:string>>",
    ).select("id", F.col("assets").alias("assets"))
    out = cql2_filter(
        df,
        {
            "op": "like",
            "args": [{"property": "assets.image.href"}, "https://x/%"],
        },
    )
    assert [r["id"] for r in out.collect()] == [1]


def test_cql2_like_casei_and_bad_pattern(spark):
    from stac_geoparquet_spark.stac.cql2 import Cql2Error, cql2_filter

    df = spark.createDataFrame(
        [("AbC",), ("zzz",)], "name string"
    )
    out = cql2_filter(
        df,
        {
            "op": "like",
            "args": [
                {"property": "name"},
                {"op": "casei", "args": ["ab%"]},
            ],
        },
    )
    assert [r["name"] for r in out.collect()] == ["AbC"]
    with pytest.raises(Cql2Error):
        cql2_filter(
            df,
            {"op": "like", "args": [{"property": "name"}, {"op": "noidea"}]},
        )


def test_nest_properties_idempotent(spark):
    """Re-running the inverse pipeline on already-JSON-shape input must
    not produce properties.properties; hoisted stragglers merge into
    the existing struct."""
    from stac_geoparquet_spark.stac.inverse import nest_properties

    df = spark.createDataFrame(
        [(1, (5.5,), "x")],
        "id bigint, properties struct<gsd:double>, extra string",
    )
    once = nest_properties(df)
    fields = {
        f.name: f.dataType.simpleString()
        for f in once.schema["properties"].dataType.fields
    }
    assert set(fields) == {"gsd", "extra"}
    twice = nest_properties(once)
    assert twice.schema == once.schema
    row = twice.select("properties.gsd", "properties.extra").first()
    assert row["gsd"] == 5.5 and row["extra"] == "x"


def test_compaction_preserves_footer_metadata(spark, tmp_path):
    """Compacting a GeoParquet directory must carry the geo /
    stac-geoparquet footer metadata forward — df.write.parquet strips
    it, so the rewrite routes through the footer-stamping writer."""
    from stac_geoparquet_spark.sinks.compact import compact_parquet
    from stac_geoparquet_spark.sinks.geoparquet import (
        read_geoparquet_metadata,
        to_geoparquet,
    )
    from stac_geoparquet_spark.stac import read_items

    src = _write_ndjson(_items(8), tmp_path / "items.ndjson")
    df = read_items(spark, src).repartition(6)
    dest = str(tmp_path / "gpq")
    to_geoparquet(df, dest)
    before = read_geoparquet_metadata(dest)
    assert "stac-geoparquet" in before
    n_before, n_after = compact_parquet(
        spark, dest, target_bytes=10**9, min_files_to_compact=2
    )
    assert n_after < n_before
    after = read_geoparquet_metadata(dest)
    assert after == before
    assert spark.read.parquet(dest).count() == 8


def test_compaction_refuses_hive_partitioned_layout(spark, tmp_path):
    from stac_geoparquet_spark.sinks.compact import plan_compaction

    dest = str(tmp_path / "hive")
    spark.range(100).selectExpr("id", "id % 3 AS k").write.partitionBy(
        "k"
    ).parquet(dest)
    with pytest.raises(ValueError, match="hive-partitioned"):
        plan_compaction(spark, dest)


def test_write_zordered_rejects_invalid_keys(spark, tmp_path):
    """Negative or NULL keys would silently destroy the clustering
    (sign-blind bit interleave); the write must fail inside the plan."""
    from stac_geoparquet_spark.operators.layout import write_zordered

    neg = spark.range(10).selectExpr("id - 5 AS a", "id AS b")
    with pytest.raises(Exception, match="non-negative"):
        write_zordered(neg, str(tmp_path / "zneg"), "a", "b")
    nulls = spark.range(10).selectExpr(
        "CASE WHEN id = 3 THEN NULL ELSE id END AS a", "id AS b"
    )
    with pytest.raises(Exception, match="non-null"):
        write_zordered(nulls, str(tmp_path / "znull"), "a", "b")
    ok = spark.range(10).selectExpr("id AS a", "id AS b")
    write_zordered(ok, str(tmp_path / "zok"), "a", "b")
    assert spark.read.parquet(str(tmp_path / "zok")).count() == 10


def test_cuped_null_z_on_zero_adjusted_variance(spark, tmp_path):
    """constant_ts sweep finding (round 9): with every event at ONE
    instant, the whole corpus lands in the pre-period, every user's
    post-spend is 0, theta = 0, and Var(Y - theta*X) is exactly 0 —
    ANSI Spark crashed with DIVIDE_BY_ZERO on z's sqrt denominator
    while DuckDB's double division returns NULL.  The shared
    _CUPED_SE2 fragment is now guarded (NOT (se2 > 0) -> NULL z) on
    both engines; the experiment still reports its counts."""
    import os
    import shutil

    import duckdb

    from tests.oracle_compare import compare

    from stac_geoparquet_spark.operators.timeseries import (
        _ab_cuped_sql,
        events_ab_cuped,
    )

    src = "/root/testdata/sf0.001"
    dst = tmp_path / "allties"
    dst.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT event_id, min(ts) OVER () AS ts, user_id,
              event_type, value, props
            FROM read_parquet('{src}/events.parquet'))
          TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in ("documents", "embeddings", "orders", "lineitem", "customer",
              "supplier", "part", "nation", "region"):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    df = events_ab_cuped(spark, str(dst))
    ok, msg = compare(df, _ab_cuped_sql(), str(dst), strict=True)
    assert ok, msg
    row = df.collect()[0]
    assert row["z_cuped"] is None
    assert row["n_a"] + row["n_b"] > 0
