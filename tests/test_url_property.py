"""URL canonicalizer property suite: a combinatorial adversarial URL
corpus (beyond what the doc_id-derived fixture reaches — userinfo-free
but otherwise hostile) is parsed + canonicalized three ways — the
Spark expressions, the DuckDB oracle expressions, and an independent
pure-Python reference — and all three must agree exactly.  Then the
canonicalizer is applied to its OWN output on both engines and must be
a fixpoint (idempotence: a second normalization pass in a pipeline
must be a no-op).
"""

from __future__ import annotations

import itertools

import duckdb
import pytest

from stac_geoparquet_spark.operators.url import (
    CANON_PATH_EXPR,
    CANON_PORT_EXPR,
    CANON_QUERY_DUCK,
    CANON_QUERY_SPARK,
    CANON_URL_EXPR,
    HOST_EXPR,
    PATH_EXPR,
    PORT_EXPR,
    QUERY_EXPR,
    REGDOM_DUCK,
    REGDOM_SPARK,
    SCHEME_EXPR,
    TWO_LEVEL_TLDS,
)

SCHEMES = ["http", "https", "HTTP", "HtTpS"]
HOSTS = [
    "example.com",
    "WWW.Example.COM",
    "sub.deep.example.co.uk",
    "example.co.uk",
    "co.uk",
    "localhost",
    "a.b",
]
PORTS = ["", ":80", ":443", ":8080"]
PATHS = ["", "/", "/a", "/a/", "/a/b//", "/p/1"]
QUERIES = [
    "",
    "?id=1",
    "?utm_source=x",
    "?utm_source=x&id=1",
    "?id=1&utm_campaign=y&z=2",
    "?a=&utm_x=&b=1",
    "?utm_a=1&utm_b=2",
    # multi-'?' queries (r09 ADVICE): a literal '?' inside a query
    # value is legal — the query must anchor at the FIRST '?', so
    # these detect any last-'?'-anchored extraction divergence
    # between the engines and the Python reference
    "?a=1?b=2",
    "?r=http://x/y?z=1",
]
FRAGS = ["", "#f", "#a/b?c=1"]


def _corpus() -> list[str]:
    urls = []
    combos = itertools.product(SCHEMES, HOSTS, PORTS, PATHS, QUERIES, FRAGS)
    for i, (s, h, po, pa, q, f) in enumerate(combos):
        # thin the full product deterministically to keep the suite fast
        if i % 7 == 0:
            urls.append(f"{s}://{h}{po}{pa}{q}{f}")
    return urls


def _py_canon(url: str) -> tuple[str, str]:
    """Independent reference: (canonical url, registrable domain)."""
    scheme, rest = url.split("://", 1)
    scheme = scheme.lower()
    hostport = rest.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    host, _, port = hostport.partition(":")
    host = host.lower()
    after_host = rest[len(hostport):]
    # RFC 3986: strip the fragment FIRST — a '?' inside a fragment is
    # fragment content, not a query (r08 ADVICE)
    pre_frag = after_host.split("#", 1)[0]
    path = pre_frag.split("?", 1)[0]
    query = pre_frag.split("?", 1)[1] if "?" in pre_frag else ""
    cport = (
        ""
        if (
            port == ""
            or (scheme == "https" and port == "443")
            or (scheme == "http" and port == "80")
        )
        else ":" + port
    )
    cpath = "" if path in ("", "/") else path.rstrip("/")
    keep = [
        p for p in query.split("&") if p and not p.startswith("utm_")
    ]
    cquery = "?" + "&".join(keep) if keep else ""
    labels = host.split(".")
    if len(labels) < 2:
        dom = host
    elif (
        len(labels) >= 3
        and ".".join(labels[-2:]) in TWO_LEVEL_TLDS
    ):
        dom = ".".join(labels[-3:])
    else:
        dom = ".".join(labels[-2:])
    return scheme + "://" + host + cport + cpath + cquery, dom


def _spark_canon(spark, urls, url_col="url"):
    df = spark.createDataFrame([(u,) for u in urls], [url_col])
    parsed = df.selectExpr(
        url_col,
        f"{SCHEME_EXPR} AS scheme",
        f"{HOST_EXPR} AS host",
        f"{PORT_EXPR} AS port",
        f"{PATH_EXPR} AS path",
        f"{QUERY_EXPR} AS query",
    ).selectExpr(
        url_col,
        "host",
        f"{CANON_PORT_EXPR} AS canon_port",
        f"{CANON_PATH_EXPR} AS canon_path",
        f"{CANON_QUERY_SPARK} AS canon_query",
        f"{REGDOM_SPARK} AS domain",
        "scheme",
    ).selectExpr(url_col, f"{CANON_URL_EXPR} AS canon", "domain")
    return {r[url_col]: (r["canon"], r["domain"]) for r in parsed.collect()}


def _duck_canon(urls):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u AS SELECT unnest(?) AS url", [list(urls)]
    )
    rows = con.execute(
        f"""
WITH p1 AS (
  SELECT url,
         {SCHEME_EXPR} AS scheme,
         {HOST_EXPR} AS host,
         {PORT_EXPR} AS port,
         {PATH_EXPR} AS path,
         {QUERY_EXPR} AS query
  FROM u
),
p2 AS (
  SELECT url, host, scheme,
         {CANON_PORT_EXPR} AS canon_port,
         {CANON_PATH_EXPR} AS canon_path,
         {CANON_QUERY_DUCK} AS canon_query,
         {REGDOM_DUCK} AS domain
  FROM p1
)
SELECT url, {CANON_URL_EXPR} AS canon, domain FROM p2
"""
    ).fetchall()
    return {u: (c, d) for u, c, d in rows}


def test_three_way_parity_and_idempotence(spark):
    urls = _corpus()
    assert len(urls) > 400
    expected = {u: _py_canon(u) for u in urls}
    got_spark = _spark_canon(spark, urls)
    got_duck = _duck_canon(urls)
    for u in urls:
        assert got_spark[u] == expected[u], (u, got_spark[u], expected[u])
        assert got_duck[u] == expected[u], (u, got_duck[u], expected[u])
    # idempotence: canonicalizing the canonical form is the identity,
    # on both engines
    canon_urls = sorted({c for c, _ in expected.values()})
    re_spark = _spark_canon(spark, canon_urls)
    re_duck = _duck_canon(canon_urls)
    for c in canon_urls:
        assert re_spark[c][0] == c, (c, re_spark[c][0])
        assert re_duck[c][0] == c, (c, re_duck[c][0])


def test_two_level_tld_rule():
    canon, dom = _py_canon("https://sub.deep.example.co.uk/a")
    assert dom == "example.co.uk"
    canon, dom = _py_canon("https://example.co.uk/a")
    assert dom == "example.co.uk"
    # a bare two-level suffix has nothing registrable under it: the
    # last-2 fallback applies
    canon, dom = _py_canon("https://co.uk/a")
    assert dom == "co.uk"
    canon, dom = _py_canon("https://localhost/a")
    assert dom == "localhost"
