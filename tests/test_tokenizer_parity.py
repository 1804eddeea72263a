"""Cross-engine tokenizer parity: every text/dedup/pipeline operator
leans on ONE tokenizer contract — Spark `split(lower(trim(text)),
'\\s+')` must agree with DuckDB `regexp_split_to_array(lower(trim(
text)), '\\s+')` — and one n-gram builder. A dialect divergence here
(Java regex vs RE2) would silently skew every gram-based oracle, so
this pins the contract on an adversarial corpus the synthetic data
never exercises."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from stac_geoparquet_spark.operators.pipeline import _sql_ngrams, _word_ngrams
from stac_geoparquet_spark.operators.text import _sql_words, _words

ADVERSARIAL = [
    "",
    " ",
    "   ",
    "\t",
    "\n",
    "a",
    "a b",
    "a  b",
    " a b ",
    "a\tb\nc",
    "a\r\nb",
    "MIXED Case WORDS",
    "a b",  # NBSP: not \s in Java regex nor RE2 — one token
    "café naïve über",
    "日本語 中文 text",
    "emoji 🎉 token",
    "trailing space ",
    "\t leading tab",
    "punct, here! ok?",
    "x" * 500,
    "many words " * 20,
    "a b c d e f g h i j",
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)], "doc_id bigint, text string"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(ADVERSARIAL))
    )
    return df, con


def test_word_split_parity(frames):
    df, con = frames
    got = {
        r["doc_id"]: r["w"]
        for r in df.select("doc_id", _words(F.col("text")).alias("w")).collect()
    }
    want = dict(
        con.execute(f"SELECT doc_id, {_sql_words()} FROM t").fetchall()
    )
    assert got == want


@pytest.mark.parametrize("n", [2, 5])
def test_ngram_parity(frames, n):
    df, con = frames
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", _word_ngrams(_words(F.col("text")), n).alias("g")
        ).collect()
    }
    want = dict(
        con.execute(
            f"SELECT doc_id, {_sql_ngrams(n)} FROM "
            f"(SELECT doc_id, {_sql_words()} AS words FROM t)"
        ).fetchall()
    )
    assert got == want
