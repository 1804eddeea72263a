"""Batch cross-engine fuzz of the shared primitives: one generated
corpus, ONE Spark job and ONE DuckDB query per property (hypothesis-
style coverage without a JVM round-trip per example).

Every text operator stands on the tokenizer contract
(split(lower(trim(text)), '\\s+') == regexp_split_to_array(...)), and
the edit-distance join stands on levenshtein() agreeing between the
JVM and DuckDB — a silent divergence in either would shift dozens of
oracles at once, so they get direct adversarial coverage here."""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

_ALPHABETS = [
    string.ascii_letters,
    string.ascii_letters + "  \t\n",
    string.printable,  # includes \x0b \x0c and punctuation
    "ab   ",  # NBSP/em-space: unicode WS that is NOT Java-trim
    "ab \x01\x1f",  # control chars: Java-trim but NOT unicode WS
    "日本語 テスト中文字",
    "aàâæçéñ øß ",
    "İstanbul ıİiI",  # JVM full-casing: lower('İ') = 'i' + U+0307
    "ΟΔΟΣ ΣΟΦΙΑΣ σοφίας Σ",  # Final_Sigma: normalized Σ->σ by contract
    "ᲈᲉⰯꟀ \U00010570\U00010d50",  # utf8proc-lagging case pairs
]


def _gen_strings(n: int = 400) -> list[str]:
    rng = random.Random(20260814)
    out = []
    for i in range(n):
        alpha = _ALPHABETS[i % len(_ALPHABETS)]
        ln = rng.randrange(0, 40)
        out.append("".join(rng.choice(alpha) for _ in range(ln)))
    # deliberate edge shapes
    out += ["", " ", "  \t ", "\n\n", "a", " a ", " ", "a b"]
    return out


def test_tokenizer_contract_agrees_cross_engine(spark):
    """THE tokenizer pair (text._words vs text._sql_words) on
    adversarial strings: Spark's trim strips ONLY the ASCII space, so
    the oracle side trims the explicit one-char set (DuckDB's native
    trim strips Unicode Zs — edge NBSP diverged until the fragment
    switched; found by this test).  Greek capital sigma exercises the
    Final_Sigma normalization contract (S -> non-final form on both
    engines)."""
    from stac_geoparquet_spark.operators.text import _sql_words, _words

    texts = _gen_strings()
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        r["i"]: r["w"]
        for r in sdf.select("i", _words(F.col("t")).alias("w")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        (exp,) = con.execute(
            f"SELECT {_sql_words('?')}", [t]
        ).fetchone()
        assert got[i] == exp, (i, repr(t), got[i], exp)


def test_levenshtein_agrees_cross_engine(spark):
    rng = random.Random(777)
    pairs = []
    for _ in range(300):
        a = "".join(rng.choice("abc x") for _ in range(rng.randrange(0, 15)))
        b = "".join(rng.choice("abc x") for _ in range(rng.randrange(0, 15)))
        pairs.append((a, b))
    # ASCII only: Spark's levenshtein counts CODEPOINTS while DuckDB's
    # counts BYTES (levenshtein('日本','日本語') = 1 vs 3), so the
    # edit-distance join's contract restricts its domain to ASCII names
    # — pinned by test_edit_distance_domain_is_ascii below.
    pairs += [("", ""), ("", "abc"), ("same", "same")]
    sdf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i long, a string, b string",
    )
    got = {
        r["i"]: r["d"]
        for r in sdf.select("i", F.levenshtein("a", "b").alias("d")).collect()
    }
    con = duckdb.connect()
    for i, (a, b) in enumerate(pairs):
        (exp,) = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()
        assert got[i] == exp, (i, repr(a), repr(b), got[i], exp)


def test_edit_distance_domain_is_ascii(spark, tmp_path):
    """Non-ASCII names are excluded from the edit-distance join on
    both engines (Spark levenshtein = codepoints, DuckDB = bytes; the
    distance of a non-ASCII pair is engine-dependent), and the two
    engines still agree on the remaining ASCII domain."""
    import duckdb

    rows = [
        (1, "red widget"),
        (2, "red widgex"),  # ed 1 from #1
        (3, "日本語の部品名です"),
        (4, "日本語の部品名です!"),  # ed 1 from #3 in codepoints
        (5, "café widget"),
        (6, "cafe widget"),
    ]
    dst = tmp_path / "ascii_dom"
    dst.mkdir()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (p_partkey BIGINT, p_name VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    con.execute(
        f"COPY (SELECT * FROM t) TO '{dst}/part.parquet' (FORMAT PARQUET)"
    )
    from stac_geoparquet_spark.operators.curation import edit_distance_join
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    got = {
        (r["a_key"], r["b_key"]) for r in edit_distance_join(spark, str(dst)).collect()
    }
    assert (1, 2) in got
    assert not any(3 in p or 4 in p or 5 in p for p in got)
    ok, msg = compare(
        edit_distance_join(spark, str(dst)),
        entry_mod.oracle_sql()["edit_distance_join"],
        str(dst),
        strict=True,
    )
    assert ok, msg


def test_hash_slice_primitive_agrees_cross_engine(spark):
    """The 60-bit hash idiom every dedup/sketch operator builds on:
    Spark CAST(conv(substring(md5(s),1,15),16,10) AS BIGINT) must equal
    DuckDB ('0x'||substr(md5(s),1,15))::BIGINT — on ASCII, unicode,
    empty, and whitespace-heavy inputs."""
    texts = _gen_strings(200)
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        r["i"]: r["h"]
        for r in sdf.selectExpr(
            "i",
            "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) AS h",
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        (exp,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [t]
        ).fetchone()
        assert got[i] == exp, (i, repr(t))


def test_timestamp_primitives_agree_cross_engine(spark):
    """hour extraction, hour truncation, and Monday-start week
    truncation on random timestamps 1900-2090 (value-level compare;
    DuckDB returns DATE for week-trunc — a type difference the
    operator oracles handle with casts — and its dayofweek is
    0-based)."""
    import datetime

    rng = random.Random(5)
    rows = [
        (
            i,
            datetime.datetime(1970, 1, 1)
            + datetime.timedelta(
                microseconds=rng.randrange(-2_000_000_000, 3_800_000_000)
                * 1_000_000
                + rng.randrange(0, 1_000_000)
            ),
        )
        for i in range(250)
    ]
    df = spark.createDataFrame(rows, "i long, ts timestamp_ntz")
    sp = {
        r["i"]: (r["hr"], r["h"], r["wk"].date(), r["dow"])
        for r in df.select(
            "i",
            F.hour("ts").alias("hr"),
            F.date_trunc("hour", "ts").alias("h"),
            F.date_trunc("week", "ts").alias("wk"),
            F.dayofweek("ts").alias("dow"),
        ).collect()
    }
    con = duckdb.connect()
    for i, ts in rows:
        hr, h, wk, dow = con.execute(
            "SELECT extract(hour FROM ?::TIMESTAMP),"
            " date_trunc('hour', ?::TIMESTAMP),"
            " CAST(date_trunc('week', ?::TIMESTAMP) AS DATE),"
            " dayofweek(?::TIMESTAMP)",
            [ts, ts, ts, ts],
        ).fetchone()
        assert sp[i] == (hr, h, wk, dow + 1), (i, ts, sp[i], (hr, h, wk, dow))


def test_substring_indexing_agrees_cross_engine(spark):
    """Character-position substring + length parity — the contract the
    tile/chunk/shingle family indexes documents by.  Adversarial mix of
    astral-plane (surrogate-pair) codepoints, combining marks, CJK, and
    controls: a codepoint-vs-code-unit divergence would silently shift
    every span boundary on exactly these inputs."""
    rng = random.Random(20260815)
    alphabets = [
        "😀🚀🔥𐍈𝕏",  # astral only (every char is a surrogate pair in UTF-16)
        "a😀b́c日本́",  # mixed BMP/astral + combining acute
        "αβγ𝛼𝛽𝛾",  # BMP greek + mathematical (astral) greek
        string.printable,
        "你好世界",
    ]
    texts = []
    for i in range(200):
        alpha = alphabets[i % len(alphabets)]
        ln = rng.randrange(0, 30)
        texts.append("".join(rng.choice(alpha) for _ in range(ln)))
    texts += ["", "😀", "a😀", "😀a", "é́"]

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        (r["i"], r["p"]): (r["ln"], r["s"])
        for r in sdf.selectExpr(
            "i", "t", "explode(array(1, 2, 5, 11)) AS p"
        )
        .selectExpr(
            "i", "p", "length(t) AS ln", "substring(t, p, 7) AS s"
        )
        .collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        for p in (1, 2, 5, 11):
            ln, s = con.execute(
                "SELECT length(?), substring(?, ?, 7)", [t, t, p]
            ).fetchone()
            g_ln, g_s = got[(i, p)]
            assert g_ln == ln, (i, p, repr(t))
            assert (g_s or "") == (s or ""), (i, p, repr(t), g_s, s)


def test_nfc_normalization_agrees_cross_engine():
    """text_nfc_audit's engine pair is Python unicodedata (the Arrow-
    batched Spark stage) vs DuckDB's utf8proc nfc_normalize — compare
    them DIRECTLY on adversarial compositions: combining marks in
    both orders, precomposed/decomposed Latin, Hangul jamo (the
    algorithmic composition block), singleton replacements (Å
    U+212B -> U+00C5), and non-starter reordering.  Unicode's
    normalization stability policy is what makes this contract safe
    across UCD versions; this test would catch a build where it
    isn't."""
    import unicodedata

    rng = random.Random(20260815)
    atoms = [
        "é", "é", "å", "å", "Å",  # Å forms
        "ḍ̇", "ḍ̇",  # non-starter reordering
        "각", "각", "가",  # Hangul jamo
        "क़", "क़",  # deprecated composition exclusions
        "ﬁ", "fi",  # ligature (NFC-invariant, NFKC would fold)
        "x", " ", "́",  # bare combining mark at string start
        "\U0001d160",  # composition exclusion outside the BMP
    ]
    texts = [
        "".join(rng.choice(atoms) for _ in range(rng.randrange(0, 8)))
        for _ in range(500)
    ]
    con = duckdb.connect()
    for t in texts:
        duck = con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        py = unicodedata.normalize("NFC", t)
        assert duck == py, repr((t, duck, py))


def test_pii_patterns_agree_cross_engine(spark):
    """The PII cascade's whole engine contract is that PII_PATTERNS
    parse identically under Java regex and RE2.  Fuzz the cascade on
    adversarial shapes — emails inside unicode, digits touching word
    boundaries, almost-IPs, plus-prefixed and parenthesised phones,
    SSN lookalikes — comparing per-kind counts AND the raw redacted
    text (not its md5, so a divergence shows the actual spans)."""
    import random

    from stac_geoparquet_spark.operators.curation import (
        PII_PATTERNS,
        pii_redact,
        pii_scan,
    )

    rng = random.Random(20260815)
    parts = [
        "a.b+c@ex-1.co", "x@y.z", "x@y.zz", "@nope", "no@tld",
        "1.2.3.4", "255.255.255.255", "999.999.999.999", "1.2.3",
        "1.2.3.4.5", "123-45-6789", "123-456-789", "12-345-6789",
        "415-555-0123", "+14155550123", "(415)555-0123", "123",
        "12345678901", "1234567890123456", "ß@exämple.de", "日本 1.1.1.1",
        "a1.2.3.4b", "end.", "x..y@z.com", "-123-45-6789-",
    ]
    texts = []
    for i in range(300):
        k = rng.randrange(0, 5)
        texts.append(" ".join(rng.choice(parts) for _ in range(k)))
    texts += parts  # each shape alone

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    scanned = pii_redact(pii_scan(sdf))
    got = {
        r["doc_id"]: (
            tuple(r[f"pii_n_{k}"] for k in PII_PATTERNS),
            r["text"],
        )
        for r in scanned.collect()
    }

    con = duckdb.connect()
    prev = "text"
    cols = []
    for kind, pat in PII_PATTERNS.items():
        lit = pat.replace("'", "''")
        cols.append(
            f"CAST(len(regexp_extract_all({prev}, '{lit}')) AS BIGINT)"
            f" AS n_{kind}"
        )
        prev = f"regexp_replace({prev}, '{lit}', '[{kind.upper()}]', 'g')"
        prev = f"({prev})"
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)]
    )
    want = {
        r[0]: (tuple(r[1:-1]), r[-1])
        for r in con.execute(
            f"SELECT doc_id, {', '.join(cols)}, {prev} AS red FROM t"
        ).fetchall()
    }
    assert got == want
