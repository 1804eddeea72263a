"""Multimodal-column tests: binary payload determinism, mapInPandas
batch plumbing, decode-stub gating, and DuckDB oracle agreement."""

import hashlib

import pytest

SF = "/root/testdata/sf0.001"


def test_media_table_schema_and_determinism(spark):
    from stac_geoparquet_spark.operators.multimodal import media_table

    m = media_table(spark, SF)
    assert [f.name for f in m.schema.fields] == [
        "doc_id",
        "media_type",
        "payload",
        "meta",
    ]
    assert m.schema["payload"].dataType.simpleString() == "binary"
    row = m.filter("doc_id = 0").collect()[0]
    # doc 0: image, payload = unhex(md5(text) * 1) = 16 bytes
    assert row["media_type"] == "image"
    assert len(row["payload"]) == 16
    assert row["meta"]["width"] == 64
    assert row["meta"]["sample_rate"] is None
    # byte-identical with hashlib on the raw text
    text = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id = 0")
        .collect()[0]["text"]
    )
    assert row["payload"] == hashlib.md5(text.encode()).digest()


def test_extract_byte_histogram_reference():
    from stac_geoparquet_spark.operators.multimodal import (
        HIST_BINS,
        extract_byte_histogram,
    )

    payload = bytes(range(256))
    hist = extract_byte_histogram(payload)
    assert len(hist) == HIST_BINS
    assert hist == [16] * HIST_BINS
    assert extract_byte_histogram(b"") == [0] * HIST_BINS


def test_image_features_match_local_decode(spark):
    from stac_geoparquet_spark.operators.multimodal import (
        extract_byte_histogram,
        media_table,
        mm_image_features,
    )

    got = {
        (r["doc_id"], r["bin"]): r["cnt"]
        for r in mm_image_features(spark, SF).collect()
    }
    local = {}
    for r in media_table(spark, SF).filter("media_type = 'image'").collect():
        for b, c in enumerate(extract_byte_histogram(r["payload"])):
            if c:
                local[(r["doc_id"], b)] = c
    assert got == local
    assert len(got) > 0


def test_frame_sample_steps(spark):
    from stac_geoparquet_spark.operators.multimodal import (
        FRAME_STEP,
        mm_frame_sample,
    )

    rows = mm_frame_sample(spark, SF).collect()
    assert len(rows) > 0
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for doc_id, idxs in by_doc.items():
        assert sorted(idxs) == list(range(0, max(idxs) + 1, FRAME_STEP))


def test_decode_stub_gated():
    from stac_geoparquet_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


@pytest.mark.parametrize(
    "name", ["mm_media_manifest", "mm_frame_sample", "mm_image_features"]
)
def test_multimodal_oracles(spark, name):
    from stac_geoparquet_spark.operators import multimodal
    from tests.oracle_compare import compare

    ok, msg = compare(
        multimodal.QUERIES[name](spark, SF), multimodal.ORACLE[name], SF
    )
    assert ok, f"{name}: {msg}"
