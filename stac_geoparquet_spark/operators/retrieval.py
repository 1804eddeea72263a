"""Lexical retrieval + term-association statistics — round 7.

The two term-level passes a curation stack runs against a corpus-sized
document table: BM25 scoring (find the documents most relevant to a
fixed probe query — the retrieval step behind retrieval-based
decontamination and "find me training docs about X" corpus audits) and
chi-square discriminative-term extraction (which terms are
over-represented in one language/domain slice — the classic feature-
selection pass before training fasttext-style quality/domain
classifiers).  The reference is a STAC conversion library with no text
surface (SURVEY §1); these extend the engine's LLM-pipeline family
next to operators/text.py, whose tokenizer contract (``_words`` /
``_sql_words``: JVM-lowercase emulation, explicit whitespace class)
they reuse so every text operator tokenizes identically on both
engines.

Scale notes (100 TB):
- both operators are explode -> groupBy on SCALING keys (doc_id,
  term); the only broadcast joins carry constant-bounded tables (the
  |QUERY_TERMS|-row df table, one corpus-stats row, the lang alphabet);
- BM25's term filter lands BEFORE the (doc, term) aggregate, so the
  shuffled exploded stream is |QUERY_TERMS| postings, not the corpus
  token stream; the final top-K is a TakeOrderedAndProject (tournament
  over partials), never a global sort;
- chi2 keeps every count an exact int64; the statistic itself is pure
  IEEE *, /, - on doubles (no libm), so both engines produce
  bit-identical values from the same exact counts — threshold
  comparisons cannot drift;
- BM25's per-document score sums <= |QUERY_TERMS| (a constant) double
  terms inside one ln-bearing expression per term; merge-order noise
  is ~1e-16 against the 5e-7 rounding quantum (the accepted exp/ln
  margin convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stac_geoparquet_spark.operators._canon import DOCS_CANON_SQL, docs_canon
from stac_geoparquet_spark.operators.text import _sql_words, _words

# fixed probe query: mid/low-df terms of the corpus vocabulary, so the
# score spread exercises both idf extremes
QUERY_TERMS = ("spark", "window", "vector", "customer")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 25

CHI2_MIN_COUNT = 5  # min in-slice docs containing the term
CHI2_CRIT = 3.84  # chi2 critical value at p < 0.05, 1 dof


# --------------------------------------------------------------------------
# BM25 top-K retrieval (Lucene idf form: ln(1 + (N - df + .5)/(df + .5))).
# Consumes the CANONICAL corpus (_canon.py): retrieval scores are
# id-keyed — a re-ingested duplicate doc_id must score once, and its df
# contribution must count once.  Docs with NULL text carry no tokens
# and are excluded from N/avgdl on both engines (a NULL-text doc can
# never match, and counting it into the length norm would skew every
# score by ingest noise).
#
# Ordering contract: ranked by the ROUNDED score (so the cross-engine
# tie-break never depends on sub-quantum ln() noise), then doc_id.  The
# final row_number window is unpartitioned but runs AFTER the top-K cut
# — its input is BM25_TOP_K rows, a constant.
# --------------------------------------------------------------------------
def _term_freqs(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, term, tf) for the query terms only — the postings
    filter lands BEFORE the aggregate, so the shuffled stream is
    |QUERY_TERMS| postings, never the corpus token stream."""
    toks = docs.select(
        "doc_id", _words(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.size("w").cast("bigint").alias("dl"),
        F.explode("w").alias("term"),
    )
    return (
        toks.where(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _corpus_stats(docs: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl) aggregate; avgdl is one exact-int
    division so both engines compute the same double."""
    return docs.select(
        "doc_id", F.size(_words(F.col("text"))).cast("bigint").alias("dl")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )


def _bm25_idf():
    return F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )


def _bm25_tf_part():
    return (F.col("tf").cast("double") * (BM25_K1 + 1.0)) / (
        F.col("tf").cast("double")
        + BM25_K1
        * (1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.col("avgdl"))
    )


def bm25_topk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = docs_canon(spark, sf_dir).where(F.col("text").isNotNull())
    tf = _term_freqs(docs)
    stats = _corpus_stats(docs)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf, tf_part = _bm25_idf(), _bm25_tf_part()
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP_K)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return scored.withColumn("rk", F.row_number().over(w).cast("bigint"))


_TERMS_IN = ", ".join(f"'{t}'" for t in QUERY_TERMS)

BM25_SQL = f"""
WITH docs AS (
  SELECT doc_id, text FROM {DOCS_CANON_SQL} d WHERE text IS NOT NULL
),
toks AS (
  SELECT doc_id, len({_sql_words()}) AS dl,
         unnest({_sql_words()}) AS term
  FROM docs
),
tf AS (
  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE term IN ({_TERMS_IN})
  GROUP BY doc_id, dl, term
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_sql_words()})) AS DOUBLE) / count(*) AS avgdl
  FROM docs
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         AS rk
FROM (
  SELECT doc_id,
         round(sum(
           ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * ({BM25_K1} + 1.0))
           / (CAST(tf AS DOUBLE)
              + {BM25_K1} * (1.0 - {BM25_B}
                             + {BM25_B} * CAST(dl AS DOUBLE) / avgdl))
         ), 6) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  GROUP BY doc_id
  ORDER BY score DESC, doc_id
  LIMIT {BM25_TOP_K}
) t
"""


# --------------------------------------------------------------------------
# Chi-square discriminative terms: for each (source, term), the 2x2
# contingency chi2 of "doc contains term" vs "doc is from source" over
# the canonical corpus — emitted when the term is POSITIVELY associated
# (observed in-slice df above expectation), supported by at least
# CHI2_MIN_COUNT in-slice docs, and significant at p < 0.05.  This is
# dictionary extraction, not ranking: no top-k, so no bounded-key
# window — the output is the full significant vocabulary, each row an
# independent keyed-aggregate result.  Source (not lang) is the slice:
# it is the axis a domain classifier trains on, and the corpus's
# source alphabet is the finer of the two partitions.
#
# Counts: term presence is per-doc DISTINCT (array_distinct in-row
# before the explode — no extra shuffle), so a/df/n/N are exact int64
# document counts.  The statistic N(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
# is evaluated in doubles from those ints with the same expression
# shape on both engines — pure IEEE multiply/divide/subtract, no libm,
# hence bit-identical results and drift-free >= comparisons (products
# are exact below 2^53; beyond, both engines round the SAME way).  The
# positive-association guard cross-multiplies in doubles for the same
# reason (bigint cross-products would overflow Spark's int64 while
# DuckDB promotes to HUGEINT — a divergence, not just a precision
# loss).
# --------------------------------------------------------------------------
def chi2_discriminative_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = docs_canon(spark, sf_dir).where(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    pres = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(_words(F.col("text")))).alias("term"),
    )
    a = pres.groupBy("term", "source").agg(F.count(F.lit(1)).alias("a"))
    n_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    # df as a window over the COMPACTED (term, source) counts — a
    # second groupBy(term) pass would re-plan the whole corpus explode
    # (Catalyst does not CSE the aggregate subtree into both join
    # sides); the window partitions on the SCALING term key and its
    # input is vocab x sources rows, already shrunk by the aggregate
    a = a.withColumn(
        "df", F.sum("a").over(Window.partitionBy("term"))
    )
    n_tot = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    ad = F.col("a").cast("double")
    dd = (
        F.col("n_docs") - F.col("df") - F.col("n_src") + F.col("a")
    ).cast("double")
    bd = (F.col("df") - F.col("a")).cast("double")
    cd = (F.col("n_src") - F.col("a")).cast("double")
    nd = F.col("n_docs").cast("double")
    chi2 = (
        nd
        * (ad * dd - bd * cd)
        * (ad * dd - bd * cd)
        / (
            F.col("df").cast("double")
            * (nd - F.col("df"))
            * F.col("n_src").cast("double")
            * (nd - F.col("n_src"))
        )
    )
    return (
        a.join(F.broadcast(n_src), "source")
        .join(F.broadcast(n_tot))
        .where(
            (F.col("a") >= CHI2_MIN_COUNT)
            # positive association: a/n_src > df/N, cross-multiplied
            & (ad * nd > F.col("df").cast("double") * F.col("n_src"))
        )
        .select(
            "source",
            "term",
            F.col("a").alias("n_docs_with_term"),
            F.round(chi2, 6).alias("chi2"),
        )
        .where(F.col("chi2") >= CHI2_CRIT)
    )


CHI2_SQL = f"""
WITH docs AS (
  SELECT doc_id, text, source FROM {DOCS_CANON_SQL} d
  WHERE text IS NOT NULL AND source IS NOT NULL
),
pres AS (
  SELECT doc_id, source, unnest(list_distinct({_sql_words()})) AS term
  FROM docs
),
a_tab AS (
  SELECT term, source, CAST(count(*) AS BIGINT) AS a,
         CAST(sum(count(*)) OVER (PARTITION BY term) AS BIGINT) AS df
  FROM pres GROUP BY term, source
),
nl AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src
       FROM docs GROUP BY source),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs)
SELECT source, term, a AS n_docs_with_term, chi2
FROM (
  SELECT source, term, a,
         round(CAST(n_docs AS DOUBLE)
               * (CAST(a AS DOUBLE)
                    * CAST(n_docs - df - n_src + a AS DOUBLE)
                  - CAST(df - a AS DOUBLE) * CAST(n_src - a AS DOUBLE))
               * (CAST(a AS DOUBLE)
                    * CAST(n_docs - df - n_src + a AS DOUBLE)
                  - CAST(df - a AS DOUBLE) * CAST(n_src - a AS DOUBLE))
               / (CAST(df AS DOUBLE)
                  * (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE))
                  * CAST(n_src AS DOUBLE)
                  * (CAST(n_docs AS DOUBLE) - CAST(n_src AS DOUBLE))), 6)
           AS chi2
  FROM a_tab JOIN nl USING (source) CROSS JOIN nt
  WHERE a >= {CHI2_MIN_COUNT}
    AND CAST(a AS DOUBLE) * CAST(n_docs AS DOUBLE)
        > CAST(df AS DOUBLE) * CAST(n_src AS DOUBLE)
) t
WHERE chi2 >= {CHI2_CRIT}
"""

# --------------------------------------------------------------------------
# Incremental BM25 scoring — the stream-static twin of
# bm25_topk_retrieval (the decontam_incremental pattern): the df /
# avgdl / N statistics are FROZEN from the base corpus (the index
# build, one scan, amortized across batches), and each incoming batch
# (doc_id % INCOMING_MOD == 0 plays the stream, the streaming/dedup.py
# convention) is scored against them — tokenize the batch, join the
# constant-size df and stats tables broadcast, one keyed aggregate on
# the BATCH's doc_id.  Per-batch cost never rescans the base corpus.
# Incoming docs whose terms are absent from the frozen index score
# over the base df exactly like unseen query terms in production
# (df rows missing -> inner join drops the term on both engines).
# Output: every incoming doc that matches >= 1 indexed term, no top-K
# (a stream scores everything; ranking is the consumer's choice).
# --------------------------------------------------------------------------
INCOMING_MOD = 50  # doc_id % 50 == 0 plays the incoming stream


def bm25_incremental_scoring(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = docs_canon(spark, sf_dir).where(F.col("text").isNotNull())
    base = docs.where(F.col("doc_id") % INCOMING_MOD != 0)
    incoming = docs.where(F.col("doc_id") % INCOMING_MOD == 0)
    dfreq = _term_freqs(base).groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    stats = _corpus_stats(base)
    tf_in = _term_freqs(incoming)
    idf, tf_part = _bm25_idf(), _bm25_tf_part()
    return (
        tf_in.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
    )


BM25_INCR_SQL = f"""
WITH docs AS (
  SELECT doc_id, text FROM {DOCS_CANON_SQL} d WHERE text IS NOT NULL
),
base_tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id, unnest({_sql_words()}) AS term
    FROM docs WHERE doc_id % {INCOMING_MOD} != 0
  ) t WHERE term IN ({_TERMS_IN})
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM base_tf GROUP BY term
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_sql_words()})) AS DOUBLE) / count(*) AS avgdl
  FROM docs WHERE doc_id % {INCOMING_MOD} != 0
),
tf_in AS (
  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id, len({_sql_words()}) AS dl,
           unnest({_sql_words()}) AS term
    FROM docs WHERE doc_id % {INCOMING_MOD} = 0
  ) t WHERE term IN ({_TERMS_IN})
  GROUP BY doc_id, dl, term
)
SELECT doc_id,
       round(sum(
         ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5))
         * (CAST(tf AS DOUBLE) * ({BM25_K1} + 1.0))
         / (CAST(tf AS DOUBLE)
            + {BM25_K1} * (1.0 - {BM25_B}
                           + {BM25_B} * CAST(dl AS DOUBLE) / avgdl))
       ), 6) AS score
FROM tf_in JOIN dfreq USING (term) CROSS JOIN stats
GROUP BY doc_id
"""

QUERIES = {
    "bm25_topk_retrieval": bm25_topk_retrieval,
    "bm25_incremental_scoring": bm25_incremental_scoring,
    "chi2_discriminative_terms": chi2_discriminative_terms,
}

ORACLE = {
    "bm25_topk_retrieval": BM25_SQL,
    "bm25_incremental_scoring": BM25_INCR_SQL,
    "chi2_discriminative_terms": CHI2_SQL,
}
