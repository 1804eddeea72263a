"""Tests for the curation operators: PII scan/redact on injected
fixtures (the synthetic corpus has no PII-shaped spans, so the regex
surface is verified here, cross-checked against DuckDB's RE2), plus
invariants for the oracle-gated rotation queries."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from stac_geoparquet_spark.operators.curation import (
    PII_PATTERNS,
    cross_lang_contamination,
    dedup_substring_spans,
    pii_redact,
    pii_scan,
    text_zipf_slope,
)

PII_DOCS = [
    (1, "contact alice.smith+x@example.co.uk or bob@mail.io today"),
    (2, "server at 10.0.255.7 answered, backup 192.168.1.1 did not"),
    (3, "ssn 123-45-6789 on file; call +1(555)123-4567 or 555-867-5309"),
    (4, "no sensitive spans in this row at all"),
    (5, "mixed: eve@corp.net from 172.16.0.9 ssn 987-65-4321"),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(PII_DOCS, "doc_id bigint, text string")


def test_pii_scan_counts(pii_df):
    rows = {r["doc_id"]: r for r in pii_scan(pii_df).collect()}
    assert rows[1]["pii_n_email"] == 2
    assert rows[2]["pii_n_ipv4"] == 2
    assert rows[3]["pii_n_ssn"] == 1
    # the SSN is attributed to ssn only (precedence), the two real
    # phone numbers still count
    assert rows[3]["pii_n_phone"] == 2
    assert rows[3]["pii_n_total"] == 3
    assert rows[4]["pii_n_total"] == 0
    assert rows[5]["pii_n_email"] == 1
    assert rows[5]["pii_n_ipv4"] == 1
    assert rows[5]["pii_n_ssn"] == 1
    assert rows[5]["pii_n_total"] == 3


def test_pii_scan_matches_duckdb_re2(pii_df):
    """Same counts under DuckDB's RE2 — the patterns are written to the
    common Java-regex/RE2 subset, and this pins that property (with the
    same precedence redaction applied between kinds on both engines)."""
    spark_counts = {
        (r["doc_id"], kind): r[f"pii_n_{kind}"]
        for r in pii_scan(pii_df).collect()
        for kind in PII_PATTERNS
    }
    con = duckdb.connect()
    for doc_id, text in PII_DOCS:
        remaining = text
        for kind, pat in PII_PATTERNS.items():
            (n,) = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [remaining, pat]
            ).fetchone()
            assert spark_counts[(doc_id, kind)] == n, (doc_id, kind)
            (remaining,) = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')",
                [remaining, pat, f"[{kind.upper()}]"],
            ).fetchone()


def test_pii_scan_total_matches_redaction(pii_df):
    """pii_n_total = the number of spans pii_redact actually replaces
    (counting on progressively-redacted text removes the double-count
    on overlapping patterns)."""
    import re

    totals = {
        r["doc_id"]: r["pii_n_total"] for r in pii_scan(pii_df).collect()
    }
    for doc_id, text in PII_DOCS:
        n = 0
        remaining = text
        for kind, pat in PII_PATTERNS.items():
            n += len(re.findall(pat, remaining))
            remaining = re.sub(pat, f"[{kind.upper()}]", remaining)
        assert totals[doc_id] == n, doc_id


def test_pii_redact(pii_df):
    out = {r["doc_id"]: r["text"] for r in pii_redact(pii_df).collect()}
    assert "[EMAIL]" in out[1] and "@" not in out[1]
    assert "[IPV4]" in out[2] and "192.168.1.1" not in out[2]
    assert "[SSN]" in out[3] and "123-45-6789" not in out[3]
    assert out[4] == PII_DOCS[3][1]  # untouched
    # redaction is idempotent on already-clean text
    clean = pii_redact(pii_redact(pii_df)).collect()
    assert {r["doc_id"]: r["text"] for r in clean} == out


def test_zipf_slope_is_negative(spark, sf_dir):
    row = text_zipf_slope(spark, sf_dir).collect()[0]
    assert row["zipf_slope"] < 0  # frequency falls with rank, always
    assert row["n_head_vocab"] >= 1


def test_cross_lang_pairs_ordered(spark, sf_dir):
    rows = cross_lang_contamination(spark, sf_dir).collect()
    assert rows, "word-soup corpus shares grams across langs"
    for r in rows:
        assert r["lang_a"] < r["lang_b"]
        assert r["n_shared_grams"] > 0


def test_substring_spans_fractions(spark, sf_dir):
    rows = dedup_substring_spans(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_dup_shingles"] <= r["n_shingles"]
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_substring_spans_detects_injected_duplicates(spark, tmp_path):
    """Two docs sharing a long verbatim span are flagged; a unique doc
    is not."""
    span = "x" * 23 + " the quick brown fox jumps over the lazy dog " + "y" * 23
    docs = (
        spark.createDataFrame(
            [
                (1, span + " tail one unique to doc one only here"),
                (2, span + " other trailing content entirely unlike"),
                (3, "completely unrelated text with no shared spans at all ok"),
            ],
            "doc_id bigint, text string",
        )
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )
    p = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(p)
    out = {
        r["doc_id"]: r for r in dedup_substring_spans(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_dup_shingles"] > 0
    assert out[2]["n_dup_shingles"] > 0
    assert out[3]["n_dup_shingles"] == 0


def test_winnowing_shared_text_shares_fingerprints(spark):
    """The guarantee winnowing exists for: docs sharing a long text
    region share interior fingerprints, unrelated docs share none
    (60-bit hashes — collisions negligible)."""
    from stac_geoparquet_spark.operators.curation import (
        fingerprint_winnowing,
        winnow_fingerprint_sets,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, "prefix one " + shared),
            (2, shared + " suffix two"),
            (3, "zzz completely different content qqq xxx yyy www vvv"),
        ],
        "doc_id bigint, text string",
    )
    sets = {
        r["doc_id"]: set(r["fps"])
        for r in winnow_fingerprint_sets(docs).collect()
    }
    assert all(len(s) >= 1 for s in sets.values())
    assert sets[1] & sets[2], "shared region must yield shared minima"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])
    # and the summary operator agrees with the sets on real data
    rows = fingerprint_winnowing(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_selected"] >= 1 and r["fp_min"] <= r["fp_max"]
