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


def test_audio_energy_trailing_short_window(spark):
    """The synthetic media payloads are always 16-byte-aligned, so the
    trailing-short-window branch never fires in the oracle gate; pin
    it here on an injected 20-byte payload against a hand computation
    AND DuckDB evaluating the oracle's window arithmetic on the same
    literal bytes."""
    import duckdb

    from stac_geoparquet_spark.operators.multimodal import (
        AUDIO_WINDOW,
        audio_energy_frame,
    )

    payload = bytes(range(40, 60))  # 20 bytes: one full window + 4 tail
    m = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id bigint, payload binary"
    )
    rows = {
        r["window_idx"]: r for r in audio_energy_frame(m).collect()
    }
    assert set(rows) == {0, 1}
    assert rows[0]["n_samples"] == AUDIO_WINDOW
    assert rows[1]["n_samples"] == 4
    expect = {
        0: sum((b - 128) ** 2 for b in payload[:16]),
        1: sum((b - 128) ** 2 for b in payload[16:]),
    }
    assert {w: r["energy"] for w, r in rows.items()} == expect

    hx = payload.hex()
    duck = dict(
        duckdb.connect().execute(
            f"""
            SELECT window_idx,
                   CAST(list_sum(list_transform(
                     generate_series(window_idx * {AUDIO_WINDOW},
                                     least(window_idx * {AUDIO_WINDOW} + {AUDIO_WINDOW} - 1,
                                           length('{hx}') // 2 - 1)),
                     i -> (('0x' || substr('{hx}', 2 * i + 1, 2))::BIGINT - 128)
                          * (('0x' || substr('{hx}', 2 * i + 1, 2))::BIGINT - 128)
                   )) AS BIGINT)
            FROM (SELECT unnest(generate_series(
                    0, CAST(ceil(length('{hx}') / 2.0 / {AUDIO_WINDOW}) AS BIGINT) - 1
                  )) AS window_idx)
            """
        ).fetchall()
    )
    assert duck == expect
