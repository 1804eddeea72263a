"""URL-keyed curation: canonicalization, registrable-domain caps, and
robots-style disallow filtering — the standard pre-dedup passes of a
web-scale corpus pipeline (a crawl's rawest duplication signal is the
URL column, and per-domain caps are the first defense against any one
site dominating the mixture).

The fixtures carry no URL column, so each operator derives a
deterministic synthetic URL per document from ``doc_id`` IN-ENGINE on
both sides (the repo's fixture-derivation convention — cf.
funnel.funnel_by_arm's md5 arm): the derivation is the fixture; the
parsing, canonicalization, domain extraction, and cap/filter logic
being exercised is real and engine-agnostic.  A production deployment
swaps the URL_EXPR projection inside `_parsed` for the corpus's real
column.

Scale notes:
- url_normalize_audit: pure in-row regexp parsing + one groupBy over
  the bounded source key; the count_distincts shuffle on (source,
  value) — the scaling key — with partial aggregation.
- cap_docs_per_domain: the twophase local-topk/kth-smallest scaffold
  keyed on the BOUNDED registrable-domain key (never a bare window
  over a hot domain — a hot domain is exactly what the cap exists
  for), then a broadcast threshold join back.
- robots_disallow_filter: the disallow table is O(domains × rules) —
  dimension-bounded — so it broadcast-joins; the per-doc verdict is
  one groupBy on the scaling doc key.
- dedup_url_canonical: dedup_exact's window-over-hash shape keyed on
  the canonical URL; only (doc_id, canon_url) rows move.

Registrable-domain extraction uses an EXPLICIT two-level-TLD table
(documented below), not the full Public Suffix List — the PSL is an
external artifact this environment cannot fetch; the table is the
sanctioned stand-in and the lookup shape (suffix match, then one extra
label) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Deterministic synthetic URL (the fixture).  Dialect-neutral SQL —
# the SAME string runs under Spark (F.expr) and DuckDB, so the two
# engines cannot disagree on the fixture itself.  Exercises: scheme
# case variance, subdomains, a multi-level TLD, default and
# non-default explicit ports, trailing slashes, utm_* tracking
# params in every position, and fragments.
# ---------------------------------------------------------------------------
URL_EXPR = """
  (CASE doc_id % 7 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'http' ELSE 'https' END)
  || '://'
  || (CASE doc_id % 5 WHEN 0 THEN 'www.' WHEN 1 THEN 'CDN.'
           WHEN 2 THEN 'api.' ELSE '' END)
  || 'site' || (doc_id % 13)
  || (CASE doc_id % 3 WHEN 0 THEN '.co.uk' WHEN 1 THEN '.org'
           ELSE '.com' END)
  || (CASE doc_id % 9 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
           WHEN 2 THEN ':8080' ELSE '' END)
  || '/p/' || (doc_id % 50)
  || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
  || (CASE doc_id % 8
        WHEN 0 THEN '?utm_source=feed&id=' || (doc_id % 11)
        WHEN 1 THEN '?id=' || (doc_id % 11) || '&utm_campaign=x'
        WHEN 2 THEN '?utm_medium=a'
        WHEN 3 THEN '?id=' || (doc_id % 11)
        ELSE '' END)
  || (CASE WHEN doc_id % 10 = 0 THEN '#sec' || (doc_id % 3) ELSE '' END)
"""

# ---------------------------------------------------------------------------
# Parse pieces over a `url` column — dialect-neutral (regexp_extract
# has the same (str, pattern, group) signature and the same
# ''-on-no-match contract in both engines; the patterns avoid
# lookaround, which DuckDB's RE2 lacks).
# ---------------------------------------------------------------------------
SCHEME_EXPR = "lower(regexp_extract(url, '^([A-Za-z]+)://', 1))"
_HOSTPORT = "regexp_extract(url, '^[A-Za-z]+://([^/?#]*)', 1)"
HOST_EXPR = f"lower(regexp_extract({_HOSTPORT}, '^([^:]*)', 1))"
PORT_EXPR = f"regexp_extract({_HOSTPORT}, ':([0-9]+)', 1)"
PATH_EXPR = "regexp_extract(url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1)"
# RFC 3986: the query starts at the FIRST '?' BEFORE any '#'.  The
# prefix excludes both '#' (so a '?' inside a fragment,
# 'http://h/p#a/b?c=1', is NOT a query — r08 ADVICE) and '?' itself
# (so a second '?' inside the query value, 'http://h/p?a=1?b=2',
# stays part of the query instead of re-anchoring the match at the
# LAST '?' — r09 ADVICE: the greedy '^[^#]*' prefix silently dropped
# everything between the first and last '?').
QUERY_EXPR = "regexp_extract(url, '^[^#?]*[?]([^#]*)', 1)"

# canonical port/path: dialect-neutral CASE over the parsed pieces
# (columns scheme/host/port/path/query are expected in scope)
CANON_PORT_EXPR = """CASE WHEN port = '' THEN ''
     WHEN scheme = 'https' AND port = '443' THEN ''
     WHEN scheme = 'http' AND port = '80' THEN ''
     ELSE ':' || port END"""
CANON_PATH_EXPR = """CASE WHEN path IN ('', '/') THEN ''
     ELSE regexp_replace(path, '/+$', '') END"""

# canonical query: drop utm_* tracking params and empty params, keep
# the rest in order.  The filter-over-split shape needs per-dialect
# function names (filter/array_join vs list_filter/array_to_string).
_Q_KEEP_SPARK = (
    "array_join(filter(split(query, '&'),"
    " x -> left(x, 4) <> 'utm_' AND x <> ''), '&')"
)
# coalesce: DuckDB's array_to_string on an EMPTY list yields NULL
# where Spark's array_join yields '' — without it the all-params-
# dropped case (a bare '?utm_medium=a' query) nulls the whole
# canonical URL on one engine only (found by the first gate run)
_Q_KEEP_DUCK = (
    "coalesce(array_to_string(list_filter(string_split(query, '&'),"
    " x -> left(x, 4) <> 'utm_' AND x <> ''), '&'), '')"
)
CANON_QUERY_SPARK = f"""CASE WHEN query = '' THEN ''
     WHEN {_Q_KEEP_SPARK} = '' THEN ''
     ELSE '?' || {_Q_KEEP_SPARK} END"""
CANON_QUERY_DUCK = f"""CASE WHEN query = '' THEN ''
     WHEN {_Q_KEEP_DUCK} = '' THEN ''
     ELSE '?' || {_Q_KEEP_DUCK} END"""

CANON_URL_EXPR = (
    "scheme || '://' || host || canon_port || canon_path || canon_query"
)

# The explicit two-level public-suffix table (PSL stand-in, stated).
TWO_LEVEL_TLDS = ("ac.jp", "co.jp", "co.uk", "com.au", "com.br", "org.uk")
_TLD_IN = ", ".join(f"'{t}'" for t in TWO_LEVEL_TLDS)

# registrable domain: last 2 host labels, or last 3 when the last 2
# are a listed two-level public suffix.  Guards keep element_at in
# bounds under ANSI (hosts with < 2 labels fall back to the host).
REGDOM_SPARK = f"""CASE
  WHEN size(split(host, '[.]')) < 2 THEN host
  WHEN size(split(host, '[.]')) >= 3
       AND concat(element_at(split(host, '[.]'), -2), '.',
                  element_at(split(host, '[.]'), -1)) IN ({_TLD_IN})
  THEN concat(element_at(split(host, '[.]'), -3), '.',
              element_at(split(host, '[.]'), -2), '.',
              element_at(split(host, '[.]'), -1))
  ELSE concat(element_at(split(host, '[.]'), -2), '.',
              element_at(split(host, '[.]'), -1))
END"""
REGDOM_DUCK = f"""CASE
  WHEN len(string_split(host, '.')) < 2 THEN host
  WHEN len(string_split(host, '.')) >= 3
       AND string_split(host, '.')[-2] || '.'
           || string_split(host, '.')[-1] IN ({_TLD_IN})
  THEN string_split(host, '.')[-3] || '.'
       || string_split(host, '.')[-2] || '.'
       || string_split(host, '.')[-1]
  ELSE string_split(host, '.')[-2] || '.'
       || string_split(host, '.')[-1]
END"""


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-by-id docs with the synthetic url and every parsed /
    canonicalized piece as in-row expression columns (one scan, no
    shuffle until a consumer aggregates)."""
    from stac_geoparquet_spark.operators._canon import docs_canon

    base = (
        docs_canon(spark, sf_dir)
        .where(F.col("doc_id").isNotNull() & F.col("source").isNotNull())
        .select("doc_id", "source", F.expr(URL_EXPR).alias("url"))
    )
    parsed = base.selectExpr(
        "doc_id",
        "source",
        "url",
        f"{SCHEME_EXPR} AS scheme",
        f"{HOST_EXPR} AS host",
        f"{PORT_EXPR} AS port",
        f"{PATH_EXPR} AS path",
        f"{QUERY_EXPR} AS query",
    )
    return parsed.selectExpr(
        "*",
        f"{CANON_PORT_EXPR} AS canon_port",
        f"{CANON_PATH_EXPR} AS canon_path",
        f"{CANON_QUERY_SPARK} AS canon_query",
        f"{REGDOM_SPARK} AS domain",
    ).selectExpr("*", f"{CANON_URL_EXPR} AS canon_url")


def _parsed_sql() -> str:
    """The oracle's mirror of ``_parsed`` as a CTE chain body (expects
    to be spliced after WITH; exposes ``parsed``)."""
    from stac_geoparquet_spark.operators._canon import DOCS_CANON_SQL

    return f"""u0 AS (
  SELECT doc_id, source, {URL_EXPR} AS url
  FROM {DOCS_CANON_SQL} documents
  WHERE doc_id IS NOT NULL AND source IS NOT NULL
),
u1 AS (
  SELECT doc_id, source, url,
         {SCHEME_EXPR} AS scheme,
         {HOST_EXPR} AS host,
         {PORT_EXPR} AS port,
         {PATH_EXPR} AS path,
         {QUERY_EXPR} AS query
  FROM u0
),
u2 AS (
  SELECT *,
         {CANON_PORT_EXPR} AS canon_port,
         {CANON_PATH_EXPR} AS canon_path,
         {CANON_QUERY_DUCK} AS canon_query,
         {REGDOM_DUCK} AS domain
  FROM u1
),
parsed AS (
  SELECT *, {CANON_URL_EXPR} AS canon_url FROM u2
)"""


# ---------------------------------------------------------------------------
# url_normalize_audit: per source, how much the canonicalizer changes
# and how much exact-dup mass it recovers (distinct raw vs distinct
# canonical URLs).
# ---------------------------------------------------------------------------
def url_normalize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _parsed(spark, sf_dir)
    agg = p.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(
            F.when(F.col("canon_url") != F.col("url"), 1)
            .otherwise(0)
            .cast("bigint")
        ).alias("n_changed"),
        F.count_distinct("url").alias("n_distinct_raw"),
        F.count_distinct("canon_url").alias("n_distinct_canon"),
    )
    return agg.selectExpr(
        "source",
        "n_urls",
        "n_changed",
        "n_distinct_raw",
        "n_distinct_canon",
        "round(CAST(n_distinct_raw - n_distinct_canon AS DOUBLE)"
        " / nullif(CAST(n_distinct_raw AS DOUBLE), 0.0), 6)"
        " AS dedup_gain",
    )


URL_NORMALIZE_SQL = f"""
WITH {_parsed_sql()}
SELECT source,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN canon_url <> url THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_raw,
       CAST(count(DISTINCT canon_url) AS BIGINT) AS n_distinct_canon,
       round(CAST(count(DISTINCT url) - count(DISTINCT canon_url) AS DOUBLE)
             / nullif(CAST(count(DISTINCT url) AS DOUBLE), 0.0), 6)
         AS dedup_gain
FROM parsed
GROUP BY source
"""


# ---------------------------------------------------------------------------
# cap_docs_per_domain: keep at most DOMAIN_CAP docs per registrable
# domain (first-crawled wins — doc_id order), flagging survivors.
# The twophase scaffold gives the per-domain k-th threshold without a
# window over a possibly-hot domain partition.
# ---------------------------------------------------------------------------
DOMAIN_CAP = 8


def cap_docs_per_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stac_geoparquet_spark.operators.twophase import (
        kth_smallest,
        local_topk,
    )

    per_doc = _parsed(spark, sf_dir).select("doc_id", "domain")
    candidates = local_topk(
        per_doc, ["domain"], [F.asc("doc_id")], DOMAIN_CAP
    ).select("domain", F.col("doc_id").alias("k"))
    thresholds = kth_smallest(candidates, ["domain"], "k", DOMAIN_CAP, "thr")
    return per_doc.join(F.broadcast(thresholds), "domain").select(
        "doc_id",
        "domain",
        (F.col("thr").isNull() | (F.col("doc_id") <= F.col("thr"))).alias(
            "selected"
        ),
    )


CAP_DOMAIN_SQL = f"""
WITH {_parsed_sql()},
r AS (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rk
  FROM parsed
)
SELECT doc_id, domain, rk <= {DOMAIN_CAP} AS selected
FROM r
"""


# ---------------------------------------------------------------------------
# robots_disallow_filter: drop docs whose URL path falls under a
# domain's disallowed prefix (robots.txt semantics: plain string
# prefix, so '/p/1' also covers '/p/10').  The rule table here is a
# deterministic per-domain fixture (a third of domains disallow
# /p/1|/p/2|/p/3, a third /p/4, a third nothing); production swaps in
# parsed robots.txt rows — the broadcast-join shape is the operator.
# ---------------------------------------------------------------------------
_RULES_CASE = """CASE WHEN length(domain) % 3 = 0
       THEN array('/p/1', '/p/2', '/p/3')
       WHEN length(domain) % 3 = 1 THEN array('/p/4')
       ELSE CAST(array() AS array<string>) END"""


def robots_disallow_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _parsed(spark, sf_dir).select("doc_id", "source", "domain", "path")
    rules = (
        p.select("domain")
        .distinct()
        .selectExpr("domain", f"explode({_RULES_CASE}) AS dis_prefix")
    )
    flagged = (
        p.join(
            F.broadcast(rules),
            (p["domain"] == rules["domain"])
            & F.expr("startswith(path, dis_prefix)"),
            "left",
        )
        .groupBy("doc_id", "source")
        .agg(F.max(rules["dis_prefix"].isNotNull()).alias("blocked"))
    )
    agg = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("blocked").cast("bigint")).alias("n_blocked"),
    )
    return agg.selectExpr(
        "source",
        "n_docs",
        "n_blocked",
        "n_docs - n_blocked AS n_kept",
        "round(CAST(n_blocked AS DOUBLE)"
        " / nullif(CAST(n_docs AS DOUBLE), 0.0), 6) AS block_rate",
    )


ROBOTS_SQL = f"""
WITH {_parsed_sql()},
doms AS (SELECT DISTINCT domain FROM parsed),
rules AS (
  SELECT domain,
         unnest(CASE WHEN length(domain) % 3 = 0
                  THEN ['/p/1', '/p/2', '/p/3']
                  WHEN length(domain) % 3 = 1 THEN ['/p/4']
                  ELSE CAST([] AS VARCHAR[]) END) AS dis_prefix
  FROM doms
),
verdict AS (
  SELECT p.doc_id, p.source,
         EXISTS (SELECT 1 FROM rules r
                 WHERE r.domain = p.domain
                   AND starts_with(p.path, r.dis_prefix)) AS blocked
  FROM parsed p
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocked,
       CAST(count(*) - sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       round(CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS DOUBLE)
             / nullif(CAST(count(*) AS DOUBLE), 0.0), 6) AS block_rate
FROM verdict
GROUP BY source
"""


QUERIES = {
    "url_normalize_audit": url_normalize_audit,
    "cap_docs_per_domain": cap_docs_per_domain,
    "robots_disallow_filter": robots_disallow_filter,
}

ORACLE = {
    "url_normalize_audit": URL_NORMALIZE_SQL,
    "cap_docs_per_domain": CAP_DOMAIN_SQL,
    "robots_disallow_filter": ROBOTS_SQL,
}


# ---------------------------------------------------------------------------
# dedup_url_canonical: exact dedup keyed on the CANONICAL URL — the
# payoff of url_normalize_audit's canonicalizer, and the first dedup
# pass a crawl pipeline runs (two fetches of http://x and
# HTTPS://x:443/#frag are the same page before any text comparison
# happens).  Shape mirrors dedup_exact: the window's hash partition
# moves only (doc_id, canon_url) rows — the canonical key is computed
# in the scan stage, and min-doc_id-wins is the survivor rule.
# ---------------------------------------------------------------------------
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = _parsed(spark, sf_dir).select("doc_id", "canon_url")
    w = Window.partitionBy("canon_url")
    return p.withColumn(
        "keep", F.col("doc_id") == F.min("doc_id").over(w)
    )


DEDUP_URL_SQL = f"""
WITH {_parsed_sql()}
SELECT doc_id, canon_url,
       doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS keep
FROM parsed
"""


QUERIES["dedup_url_canonical"] = dedup_url_canonical
ORACLE["dedup_url_canonical"] = DEDUP_URL_SQL


# ---------------------------------------------------------------------------
# domain_effective_diversity: per source, how concentrated the corpus
# is on registrable domains — Shannon entropy of the domain
# distribution, its exponential (the "effective number of domains"),
# and the single largest domain's share.  The curation dashboard
# number behind per-domain caps: a source whose effective-domain count
# collapses is one crawler loop away from being a single-site dump.
#
# Scale shape: (source, domain) keyed aggregate, then a bounded
# per-source reduce — the entropy is computed from c*ln(c) partial
# sums so no second pass or window over the source key is needed
# (H = ln(n) - sum(c*ln(c))/n, exact algebra, same text both engines).
# ---------------------------------------------------------------------------
def domain_effective_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        _parsed(spark, sf_dir)
        .select("source", "domain")
        .groupBy("source", "domain")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = per.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_domains"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
        .alias("clnc"),
        F.max("c").cast("bigint").alias("max_c"),
    )
    return agg.selectExpr(
        "source",
        "n_docs",
        "n_domains",
        """CASE WHEN n_docs > 0
                THEN round(ln(CAST(n_docs AS DOUBLE))
                     - clnc / CAST(n_docs AS DOUBLE), 6) + 0.0
           END AS domain_entropy_nats""",
        """CASE WHEN n_docs > 0
                THEN round(exp(ln(CAST(n_docs AS DOUBLE))
                     - clnc / CAST(n_docs AS DOUBLE)), 6) + 0.0
           END AS effective_domains""",
        "round(CAST(max_c AS DOUBLE)"
        " / nullif(CAST(n_docs AS DOUBLE), 0.0), 6) AS top_domain_share",
    )


DOMAIN_DIVERSITY_SQL = f"""
WITH {_parsed_sql()},
per AS (
  SELECT source, domain, CAST(count(*) AS BIGINT) AS c
  FROM parsed GROUP BY source, domain
),
agg AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_domains,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc,
         CAST(max(c) AS BIGINT) AS max_c
  FROM per GROUP BY source
)
SELECT source,
       n_docs,
       n_domains,
       CASE WHEN n_docs > 0
            THEN round(ln(CAST(n_docs AS DOUBLE))
                 - clnc / CAST(n_docs AS DOUBLE), 6) + 0.0
       END AS domain_entropy_nats,
       CASE WHEN n_docs > 0
            THEN round(exp(ln(CAST(n_docs AS DOUBLE))
                 - clnc / CAST(n_docs AS DOUBLE)), 6) + 0.0
       END AS effective_domains,
       round(CAST(max_c AS DOUBLE)
             / nullif(CAST(n_docs AS DOUBLE), 0.0), 6) AS top_domain_share
FROM agg
"""


QUERIES["domain_effective_diversity"] = domain_effective_diversity
ORACLE["domain_effective_diversity"] = DOMAIN_DIVERSITY_SQL
