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


# ---------------------------------------------------------------------------
# round 10: the greedy BPE encoder contract — Spark's in-row
# aggregate() fold and DuckDB's recursive-CTE scan must emit the same
# token count for the same word and merge list, including on Unicode
# where substring/length semantics could diverge (both engines count
# code points), overlapping merge candidates (greedy takes the
# leftmost match, never the globally-minimal segmentation), and long
# runs.
# ---------------------------------------------------------------------------
BPE_WORDS = [
    "a",
    "ab",
    "ba",
    "aab",  # greedy: a|ab — the leftmost-match order pin
    "aaab",
    "abab",
    "aabb",
    "banana",
    "abcabc",
    "café",
    "naïve",
    "日本語",
    "ひらがな",
    "emoji🎉x",
    "x" * 500,
    "ab" * 200,
    "ababa",
]
BPE_MERGES = ["ab", "aa", "na", "本語", "がな", "éx"]


def _py_greedy(word: str, merges: set) -> int:
    p, t = 0, 0
    while p < len(word):
        p += 2 if word[p : p + 2] in merges else 1
        t += 1
    return t


def test_bpe_greedy_encoder_cross_engine_parity(spark):
    from stac_geoparquet_spark.operators.curation import bpe_fold_expr

    merges_lit = ", ".join(f"'{m}'" for m in BPE_MERGES)
    sdf = (
        spark.createDataFrame([(w,) for w in BPE_WORDS], ["word"])
        .selectExpr("word", f"array({merges_lit}) AS merges")
        .selectExpr("word", f"{bpe_fold_expr('word')} AS toks")
    )
    got_spark = {r["word"]: r["toks"] for r in sdf.collect()}

    words_lit = ", ".join(f"'{w}'" for w in BPE_WORDS)
    got_duck = dict(
        duckdb.sql(
            f"""
WITH RECURSIVE ml AS (SELECT [{merges_lit}] AS m),
w AS (SELECT unnest([{words_lit}]) AS word),
st AS (
  SELECT word, 1 AS p, CAST(0 AS BIGINT) AS t FROM w
  UNION ALL
  SELECT st.word,
         st.p + CASE WHEN list_contains(ml.m, substr(st.word, st.p, 2))
                     THEN 2 ELSE 1 END,
         st.t + 1
  FROM st, ml WHERE st.p <= length(st.word)
)
SELECT word, t FROM st WHERE p > length(word)
"""
        ).fetchall()
    )
    expected = {w: _py_greedy(w, set(BPE_MERGES)) for w in BPE_WORDS}
    assert got_spark == expected
    assert got_duck == expected
