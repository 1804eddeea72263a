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
from stac_geoparquet_spark.operators._exprs import const_cols
from stac_geoparquet_spark.operators._io import fenced
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
@const_cols
def _qterm_cols() -> tuple:
    """Constant Column fragments of ``_qterm_counts`` — built once per
    process (every node is compile-time constant; _exprs.py contract).
    The retrieval family re-constructs these on every call of its six
    operators, so the per-node py4j round trips were a fixed driver
    tax (guide §5)."""
    tokenize = _words(F.col("text")).alias("w")
    counts = (
        F.size("w").cast("bigint").alias("dl"),
        *[
            F.size(F.filter("w", lambda x: x == F.lit(t)))
            .cast("bigint")
            .alias(f"tf_{i}")
            for i, t in enumerate(QUERY_TERMS)
        ],
    )
    return tokenize, counts


def _qterm_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, tf_0..tf_{|q|-1}) — per-doc occurrence counts of
    each (compile-time constant) query term, computed IN-ROW: one
    tokenize, one size(filter(w, x == term)) per term, zero exchanges.
    The tokens array materializes once as a named column (Catalyst
    does not CSE into lambda bodies)."""
    tokenize, counts = _qterm_cols()
    out = docs.select("doc_id", tokenize)
    return out.select("doc_id", *counts)


@const_cols
def _term_entries_col():
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.col(f"tf_{i}").alias("tf"),
            )
            for i, t in enumerate(QUERY_TERMS)
        ]
    )
    return F.explode(F.filter(entries, lambda e: e["tf"] > 0)).alias("e")


def _term_freqs(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, term, tf) for the query terms only — r10: the
    per-term counts are in-row expressions (``_qterm_counts``) and the
    postings rows come from a NARROW explode of the non-zero counts,
    so the corpus token stream is never exploded and the old
    (doc_id, dl, term) aggregate exchange disappears from every
    consumer (bm25_topk / ndcg / ql / incremental)."""
    cnt = _qterm_counts(docs)
    return cnt.select("doc_id", "dl", _term_entries_col()).select(
        "doc_id", "dl", F.col("e.term").alias("term"), F.col("e.tf").alias("tf")
    )


@const_cols
def _corpus_stats_cols() -> tuple:
    return (
        F.size(_words(F.col("text"))).cast("bigint").alias("dl"),
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )


def _corpus_stats(docs: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl) aggregate; avgdl is one exact-int
    division so both engines compute the same double."""
    dl, n_docs, avgdl = _corpus_stats_cols()
    return docs.select("doc_id", dl).agg(n_docs, avgdl)


@const_cols
def _bm25_idf():
    return F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )


@const_cols
def _bm25_tf_part():
    return (F.col("tf").cast("double") * (BM25_K1 + 1.0)) / (
        F.col("tf").cast("double")
        + BM25_K1
        * (1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.col("avgdl"))
    )


@const_cols
def _bm25_idf_at(i: int):
    return F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col(f"df_{i}")).cast("double") + F.lit(0.5))
        / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
    )


@const_cols
def _bm25_tf_part_at(i: int):
    return (F.col(f"tf_{i}").cast("double") * (BM25_K1 + 1.0)) / (
        F.col(f"tf_{i}").cast("double")
        + BM25_K1
        * (1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.col("avgdl"))
    )


def bm25_topk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10 restructure (same results, proven against the unchanged
    # oracle): the old shape exploded the corpus token stream into a
    # (doc, term) aggregate, joined df/stats back, and re-aggregated
    # per doc — four corpus-order exchanges across three tokenize
    # passes.  QUERY_TERMS is a compile-time constant, so everything
    # per-doc is IN-ROW: pass 1 aggregates (n_docs, avgdl, df_t) in
    # ONE 1-row reduce; pass 2 scores each matching doc with a fixed
    # |q|-term sum.  Two corpus passes, zero keyed exchanges, the
    # global top-K stays TakeOrderedAndProject.  The fixed-order
    # per-doc sum replaces the aggregate's arbitrary merge order —
    # both land on the same round(,6) value (the accepted ~1e-16 vs
    # 5e-7 quantum margin, same contract as before).
    docs = docs_canon(spark, sf_dir, spread=True).where(F.col("text").isNotNull())
    cnt = _qterm_counts(docs)
    stats_aggs, gate, total = _bm25_topk_cols()
    scored = (
        cnt.where(gate)
        .join(F.broadcast(cnt.agg(*stats_aggs)))
        .select("doc_id", F.round(total, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP_K)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return scored.withColumn("rk", F.row_number().over(w).cast("bigint"))


@const_cols
def _qstats_agg_cols() -> tuple:
    """(n_docs, avgdl, df_0..df_{|q|-1}) aggregate list over the
    in-row term counts — shared by bm25_topk and the incremental
    scorer's frozen-index stats."""
    return (
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )


@const_cols
def _bm25_topk_cols() -> tuple:
    nq = len(QUERY_TERMS)
    contrib = [
        F.when(F.col(f"tf_{i}") > 0, _bm25_idf_at(i) * _bm25_tf_part_at(i))
        .otherwise(F.lit(0.0))
        for i in range(nq)
    ]
    total = contrib[0]
    for c in contrib[1:]:
        total = total + c
    gate = F.greatest(*[F.col(f"tf_{i}") for i in range(nq)]) > 0
    return _qstats_agg_cols(), gate, total


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
    # r10 restructure (same results, unchanged oracle): base-side
    # df/n_docs/avgdl reduce to ONE 1-row pass over the in-row term
    # counts (the bm25_topk shape — the old form tokenized base twice
    # and aggregated the exploded stream), and incoming docs score
    # in-row with the fixed |q|-term sum instead of explode + join +
    # re-aggregate.  Two corpus passes, zero keyed exchanges.
    docs = docs_canon(spark, sf_dir, spread=True).where(F.col("text").isNotNull())
    base_cnt = _qterm_counts(docs.where(F.col("doc_id") % INCOMING_MOD != 0))
    in_cnt = _qterm_counts(docs.where(F.col("doc_id") % INCOMING_MOD == 0))
    any_match, total = _bm25_incr_cols()
    return (
        in_cnt.join(F.broadcast(base_cnt.agg(*_qstats_agg_cols())))
        .where(any_match)
        .select("doc_id", F.round(total, 6).alias("score"))
    )


@const_cols
def _bm25_incr_cols() -> tuple:
    # a term ABSENT from the base index (df_i = 0) contributes nothing
    # and does not qualify a doc for output — the old inner join on
    # dfreq dropped those postings; the guards reproduce it exactly
    nq = len(QUERY_TERMS)
    contrib = [
        F.when(
            (F.col(f"tf_{i}") > 0) & (F.col(f"df_{i}") > 0),
            _bm25_idf_at(i) * _bm25_tf_part_at(i),
        ).otherwise(F.lit(0.0))
        for i in range(nq)
    ]
    total = contrib[0]
    for c in contrib[1:]:
        total = total + c
    matched = [
        (F.col(f"tf_{i}") > 0) & (F.col(f"df_{i}") > 0) for i in range(nq)
    ]
    any_match = matched[0]
    for m in matched[1:]:
        any_match = any_match | m
    return any_match, total


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

# --------------------------------------------------------------------------
# Ranking-quality report: NDCG@K + MRR@K per probe term — round 10.
# The standard eval a training-data pipeline runs on its retrieval
# stage (the lexical twin of ann_recall_report's "eval before trusting
# the index"): each QUERY_TERMS term is scored as its own single-term
# BM25 query against the canonical corpus, and the resulting top-K
# ranking is graded against a deterministic relevance label,
#   grade = least(7, tf)   (gain 2^grade - 1),
# i.e. raw within-doc term frequency capped at 7.  The label is
# deliberately BM25-minus-its-priors: BM25 re-orders raw tf by idf and
# by the dl/avgdl length norm, so NDCG measures exactly how much the
# length normalization re-orders frequency-graded relevance (1.0 =
# none), and MRR@K uses grade >= NDCG_REL_GRADE as the binary
# "relevant" cut.  Both metrics are K-truncated, the standard form.
#
# Determinism: the ranking orders by the ROUNDED score then doc_id
# (the bm25_topk_retrieval contract), and every log2 discount is a
# PRECOMPUTED Python double constant embedded in both engines' plans —
# zero libm calls at query time, so position discounts are
# bit-identical cross-engine; the DCG sum's merge-order noise is
# ~1e-16 against the 5e-7 rounding quantum (the accepted margin).
# IDCG comes closed-form from the per-term grade histogram (grade is
# bounded by 7, so "the K best grades in order" is pure arithmetic
# over cumulative counts — no second ranking pass).
#
# Scale shape: the tf postings (filtered to |QUERY_TERMS| terms BEFORE
# the aggregate) feed (a) the 4x7-row grade histogram and (b) the
# scored ranking — two consumers of a corpus-scale stream, hence two
# scans (the no-CSE contract; the stream is too big to fence).  The
# per-term top-K is the twophase local-topk scaffold (never a window
# partitioned by the bounded term key); the histogram/stats joins are
# broadcast.  One BroadcastNestedLoopJoin carries the 1-row corpus
# stats; everything else is hash joins + keyed aggregates.
# --------------------------------------------------------------------------
import itertools as _itertools
import math as _math

NDCG_K = BM25_TOP_K  # 25
NDCG_MAX_GRADE = 7
NDCG_REL_GRADE = 4

_NDCG_DISC = [1.0 / _math.log2(i + 1) for i in range(1, NDCG_K + 1)]
_NDCG_HCUM = list(_itertools.accumulate(_NDCG_DISC))


def _arr_at(vals: list[float], idx_expr: str, dialect: str) -> str:
    """1-based constant-array lookup, per dialect.  Spark needs the D
    suffix (bare decimal literals bind as DECIMAL); DuckDB casts the
    extracted element (its list literal also binds DECIMAL, which
    preserves the exact decimal text, so the cast lands on the same
    nearest double a direct parse would)."""
    if dialect == "spark":
        lits = ", ".join(f"{v!r}D" for v in vals)
        return f"element_at(array({lits}), CAST({idx_expr} AS INT))"
    lits = ", ".join(repr(v) for v in vals)
    return f"CAST(list_extract([{lits}], CAST({idx_expr} AS INT)) AS DOUBLE)"


def _ndcg_h(m_expr: str, dialect: str) -> str:
    """H(m) = sum_{i=1..m} 1/log2(i+1) for 0 <= m <= K, from the
    precomputed cumulative table (H(0) = 0)."""
    return (
        f"(CASE WHEN {m_expr} < 1 THEN 0.0"
        f" ELSE {_arr_at(_NDCG_HCUM, m_expr, dialect)} END)"
    )


_NDCG_GAIN = (
    "(CASE grade "
    + " ".join(
        f"WHEN {g} THEN {float(2 ** g - 1)!r}"
        for g in range(1, NDCG_MAX_GRADE + 1)
    )
    + " ELSE 0.0 END)"
)


def _ndcg_idcg(dialect: str) -> str:
    """Closed-form IDCG@K from cumulative grade counts cum7..cum1
    (cum_g = docs with grade >= g): grade-g docs occupy ideal
    positions cum_{g+1}+1 .. cum_g, K-truncated."""
    parts = []
    for g in range(NDCG_MAX_GRADE, 0, -1):
        hi = _ndcg_h(f"least({NDCG_K}, cum{g})", dialect)
        lo = (
            _ndcg_h(f"least({NDCG_K}, cum{g + 1})", dialect)
            if g < NDCG_MAX_GRADE
            else "0.0"
        )
        parts.append(f"{float(2 ** g - 1)!r} * ({hi} - {lo})")
    return "(" + " + ".join(parts) + ")"


_NDCG_DCG_AGG = {
    d: f"sum({_NDCG_GAIN} * {_arr_at(_NDCG_DISC, 'rk', d)})"
    for d in ("spark", "duck")
}
_NDCG_MRR_AGG = (
    f"round(coalesce(max(CASE WHEN grade >= {NDCG_REL_GRADE}"
    f" THEN 1.0 / CAST(rk AS DOUBLE) END), 0.0), 6)"
)


@const_cols
def _ndcg_wide_agg_cols() -> tuple:
    """The one-corpus-reduce aggregate list + the gstats pivot explode
    of ``bm25_ndcg_report`` — every node compile-time constant, ~2,400
    py4j round trips when rebuilt per call (the registry's single
    largest construction cell)."""
    nq = len(QUERY_TERMS)
    aggs = (
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint"))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(nq)
        ],
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        F.least(
                            F.lit(NDCG_MAX_GRADE), F.col(f"tf_{i}")
                        )
                        >= g,
                        F.lit(1),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"cum_{i}_{g}")
            for i in range(nq)
            for g in range(1, NDCG_MAX_GRADE + 1)
        ],
    )
    pivot = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("term"),
                    F.col(f"df_{i}").alias("df"),
                    # n_docs/avgdl ride every term struct (r11): the
                    # pivot is then the aggregate's ONLY consumer, so
                    # one corpus reduce serves scoring AND report with
                    # no fence and no reliance on runtime stage reuse
                    F.col("n_docs").alias("n_docs"),
                    F.col("avgdl").alias("avgdl"),
                    *[
                        F.col(f"cum_{i}_{g}").alias(f"cum{g}")
                        for g in range(1, NDCG_MAX_GRADE + 1)
                    ],
                )
                for i, t in enumerate(QUERY_TERMS)
            ]
        )
    ).alias("e")
    grade = F.least(F.lit(NDCG_MAX_GRADE), F.col("tf")).cast("bigint")
    return aggs, pivot, grade


def bm25_ndcg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stac_geoparquet_spark.operators.twophase import local_topk

    docs = docs_canon(spark, sf_dir, spread=True).where(F.col("text").isNotNull())
    cnt = _qterm_counts(docs)
    # r10: ONE corpus reduce carries everything both stat consumers
    # need — n_docs/avgdl (the old separate _corpus_stats pass) AND the
    # per-term df + grade histogram (the old gstats aggregate) — as a
    # single fenced 1-row frame; gstats pivots out of it in-plan (a
    # |q|-element constant explode, no second corpus pass, and the old
    # 3 corpus tokenize passes drop to 2).
    aggs, pivot, grade = _ndcg_wide_agg_cols()
    # r11 batch 4: an un-fenced wide reduce was TRIED and REVERTED —
    # the two gstats consumers prune the aggregate divergently (scoring
    # keeps df/n_docs/avgdl, the report keeps the cums), so their
    # exchange subtrees are NOT canonically equal and AQE stage reuse
    # covers only one copy: the runtime final plan ran an EXTRA corpus
    # pass (a third text scan) — a scale regression traded for ~0.1 s
    # of local construction.  The fence keeps the corpus reduce at
    # exactly one pass; what r11 does keep is the pivot carrying
    # n_docs/avgdl so scoring needs ONE broadcast term join instead of
    # a term join plus a 1-row BNLJ.
    wide = fenced(cnt.agg(*aggs))
    gstats = wide.select(pivot).select("e.*")
    tfg = _term_freqs(docs).withColumn("grade", grade)
    idf, tf_part = _bm25_idf(), _bm25_tf_part()
    scored = (
        tfg.join(
            F.broadcast(gstats.select("term", "df", "n_docs", "avgdl")),
            "term",
        )
        .select(
            "term",
            "doc_id",
            "grade",
            F.round(idf * tf_part, 6).alias("score"),
        )
    )
    cand = local_topk(
        scored,
        ["term"],
        [F.col("score").desc(), F.col("doc_id").asc()],
        NDCG_K,
    )
    ranked = (
        cand.groupBy("term")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("score")).alias("ns"),
                            F.col("doc_id").alias("doc_id"),
                            F.col("grade").alias("grade"),
                        )
                    )
                ),
                1,
                NDCG_K,
            ).alias("arr")
        )
        .select("term", F.posexplode("arr").alias("pos", "r"))
        .select(
            "term",
            (F.col("pos") + 1).cast("bigint").alias("rk"),
            F.col("r.grade").alias("grade"),
        )
    )
    rep = ranked.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranked"),
        F.expr(_NDCG_DCG_AGG["spark"]).alias("dcg"),
        F.expr(_NDCG_MRR_AGG).alias("mrr"),
    )
    return (
        rep.join(F.broadcast(gstats), "term")
        .selectExpr(
            "term",
            "df",
            f"cum{NDCG_REL_GRADE} AS n_rel",
            "n_ranked",
            f"""CASE WHEN {_ndcg_idcg('spark')} > 0.0
                    THEN round(dcg / {_ndcg_idcg('spark')}, 6) + 0.0
               END AS ndcg_at_{NDCG_K}""",
            "mrr",
        )
    )


_NDCG_CUMS_SQL = ", ".join(
    f"""CAST(coalesce(sum(CASE WHEN grade >= {g} THEN 1 END), 0)
          AS BIGINT) AS cum{g}"""
    for g in range(1, NDCG_MAX_GRADE + 1)
)

NDCG_SQL = f"""
WITH docs AS (
  SELECT doc_id, text FROM {DOCS_CANON_SQL} d WHERE text IS NOT NULL
),
toks AS (
  SELECT doc_id, len({_sql_words()}) AS dl,
         unnest({_sql_words()}) AS term
  FROM docs
),
tfg AS (
  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf,
         least({NDCG_MAX_GRADE}, CAST(count(*) AS BIGINT)) AS grade
  FROM toks WHERE term IN ({_TERMS_IN})
  GROUP BY doc_id, dl, term
),
gstats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df, {_NDCG_CUMS_SQL}
  FROM tfg GROUP BY term
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_sql_words()})) AS DOUBLE) / count(*) AS avgdl
  FROM docs
),
scored AS (
  SELECT term, doc_id, grade,
         round(
           ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * ({BM25_K1} + 1.0))
           / (CAST(tf AS DOUBLE)
              + {BM25_K1} * (1.0 - {BM25_B}
                             + {BM25_B} * CAST(dl AS DOUBLE) / avgdl)),
         6) AS score
  FROM tfg JOIN gstats USING (term) CROSS JOIN stats
),
ranked AS (
  SELECT term, grade, rk FROM (
    SELECT term, grade,
           CAST(row_number() OVER (PARTITION BY term
                ORDER BY score DESC, doc_id) AS BIGINT) AS rk
    FROM scored
  ) r WHERE rk <= {NDCG_K}
),
rep AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS n_ranked,
         {_NDCG_DCG_AGG['duck']} AS dcg,
         {_NDCG_MRR_AGG} AS mrr
  FROM ranked GROUP BY term
)
SELECT term, df, cum{NDCG_REL_GRADE} AS n_rel, n_ranked,
       CASE WHEN {_ndcg_idcg('duck')} > 0.0
            THEN round(dcg / {_ndcg_idcg('duck')}, 6) + 0.0
       END AS ndcg_at_{NDCG_K},
       mrr
FROM rep JOIN gstats USING (term)
"""

# --------------------------------------------------------------------------
# Hybrid retrieval via Reciprocal Rank Fusion (round 10): fuse the
# embedding kNN ranking (semantic) with a query-by-example BM25
# ranking (lexical) for the same N_QUERIES probe documents — the
# standard two-tower + keyword hybrid every retrieval stack ships,
# scored with RRF (Cormack et al.): rrf(d) = sum over systems of
# 1 / (RRF_K0 + rank_sys(d)), which needs NO score calibration
# between systems (ranks only).  The embedding side is the shipped
# session-cached knn_brute_force (vec_id == doc_id by fixture
# contract); the lexical side scores every corpus doc against the
# DISTINCT words of each query document (BM25 over shared terms,
# self-match excluded like the kNN side).
#
# Determinism: both input rankings order by round-6 scores with id
# tie-breaks (shipped contracts); RRF terms 1/(60+rank) are exact
# rationals of small ints summed in fixed order, rounded to 6; the
# fused ranking breaks ties by doc_id.
#
# Scale shape: the query-term dictionary is bounded (N_QUERIES docs'
# distinct words) and broadcast — the corpus token stream is filtered
# to it BEFORE the (doc, term) aggregate (the bm25_topk postings
# argument); per-query lexical top-K rides the twophase local-topk
# scaffold; the fusion is join-free — union the tagged rank lists
# and groupBy (query_id, doc_id) with max() per side, identical to
# a full-outer join (each pair appears at most once per system) but
# one bounded hash aggregate over <= 2K rows per query (Spark
# cannot broadcast full-outer joins, so the join form would
# sort-merge); the final ranking window's input is that bounded
# union (allowlisted).
# --------------------------------------------------------------------------
RRF_K0 = 60
RRF_TOP_K = 10
LEX_TOP_K = 10


def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stac_geoparquet_spark.operators.similarity import (
        N_QUERIES,
        knn_brute_force,
    )
    from stac_geoparquet_spark.operators.twophase import local_topk

    # r10: spread=False — unlike the single-pass retrieval ops, this
    # op reads docs through several NON-identical branches (qterms /
    # toks / stats / dfreq), and AQE stage reuse only deduplicates
    # identical subtrees, so each distinct branch re-paid the spread's
    # round-robin exchange of the full text column.  Un-spread, each
    # branch is a bare (memoized) scan.  Interleaved A/B solo at
    # sf0.1: min exec 3.70 spread vs 2.80 plain.
    docs = docs_canon(spark, sf_dir).where(F.col("text").isNotNull())
    # r10: fenced — bounded by the N_QUERIES query docs' distinct
    # terms, and consumed THREE times (the tf semijoin build side and
    # the lex_scored join, plus the distinct projection) — each read
    # re-ran the docs scan + tokenize without it (guide §2.4).
    qterms = fenced(
        docs.where(F.col("doc_id") < N_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct(_words(F.col("text")))).alias(
                "term"
            ),
        )
        .where(F.col("term") != "")
    )
    toks = docs.select(
        "doc_id", _words(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.size("w").cast("bigint").alias("dl"),
        F.explode("w").alias("term"),
    )
    tf = (
        toks.join(
            F.broadcast(qterms.select("term").distinct()), "term"
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = _corpus_stats(docs)
    # r11: dfreq and lex_scored both consume tf, and Catalyst plans the
    # whole tokenize+explode+aggregate subtree twice (no CSE) — but AQE
    # DOES reuse shuffle stages whose canonicalized plans are identical
    # (ReusedQueryStage).  Two things made the copies differ in r10:
    # (a) dfreq never read the ``tf`` count, so column pruning stripped
    # count(1) from its copy of the aggregate; the ``tf > 0`` guard
    # (a tautology: tf is a per-group count(1) >= 1) keeps the column
    # alive so both partial aggregates compute the same functions;
    # (b) the null-intolerant ``doc_id != query_id`` filter below
    # inferred an extra isnotnull(doc_id) into the lex copy's scan —
    # the coalesce form keeps identical WHERE semantics (NULL -> FALSE
    # -> dropped, matching the oracle's ``t.doc_id <> q.query_id``)
    # without licensing that inference.  With both aligned, the corpus
    # tokenize/explode/aggregate pass runs ONCE and dfreq reads the
    # reused stage.
    dfreq = (
        tf.where(F.col("tf") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf, tf_part = _bm25_idf(), _bm25_tf_part()
    lex_scored = (
        tf.join(F.broadcast(qterms), "term")
        .where(
            F.coalesce(
                F.col("doc_id") != F.col("query_id"), F.lit(False)
            )
        )
        .join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
    )
    cand = local_topk(
        lex_scored,
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id").asc()],
        LEX_TOP_K,
    )
    lex = (
        cand.groupBy("query_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("score")).alias("ns"),
                            F.col("doc_id").alias("doc_id"),
                        )
                    )
                ),
                1,
                LEX_TOP_K,
            ).alias("arr")
        )
        .select("query_id", F.posexplode("arr").alias("pos", "r"))
        .select(
            "query_id",
            F.col("r.doc_id").alias("doc_id"),
            (F.col("pos") + 1).cast("bigint").alias("lex_rank"),
        )
    )
    cos = knn_brute_force(spark, sf_dir).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("cos_rank"),
    )
    tagged = lex.select(
        "query_id",
        "doc_id",
        F.col("lex_rank"),
        F.lit(None).cast("bigint").alias("cos_rank"),
    ).unionByName(
        cos.select(
            "query_id",
            "doc_id",
            F.lit(None).cast("bigint").alias("lex_rank"),
            F.col("cos_rank"),
        )
    )
    # min() per side = best rank wins; a ranking is a SET of docs, so a
    # duplicate id surviving multiset scoring (dup-id re-ingest keeps
    # both payload copies in the kNN top-K) collapses to its best
    # position before fusion — the oracle collapses identically.
    fused = (
        tagged.groupBy("query_id", "doc_id")
        .agg(
            F.min("lex_rank").alias("lex_rank"),
            F.min("cos_rank").alias("cos_rank"),
        )
        .selectExpr(
            "query_id",
            "doc_id",
            "lex_rank IS NOT NULL AS in_lex",
            "cos_rank IS NOT NULL AS in_cos",
            f"""round(coalesce(1.0 / ({RRF_K0} + CAST(lex_rank AS DOUBLE)),
                               0.0)
                      + coalesce(1.0 / ({RRF_K0} + CAST(cos_rank AS DOUBLE)),
                                 0.0), 6) AS rrf""",
        )
    )
    # the ranking window's input is the bounded union of two top-K
    # lists per query (<= LEX_TOP_K + TOP_K rows) — allowlisted
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= RRF_TOP_K)
        .select("query_id", "doc_id", "in_lex", "in_cos", "rrf", "rk")
    )


def _hybrid_rrf_oracle_sql() -> str:
    from stac_geoparquet_spark.operators.similarity import (
        KNN_SQL,
        N_QUERIES,
    )

    return f"""
WITH docs AS (
  SELECT doc_id, text FROM {DOCS_CANON_SQL} d WHERE text IS NOT NULL
),
qterms AS (
  SELECT doc_id AS query_id, term FROM (
    SELECT doc_id, unnest(list_distinct({_sql_words()})) AS term
    FROM docs WHERE doc_id < {N_QUERIES}
  ) t WHERE term <> ''
),
toks AS (
  SELECT doc_id, len({_sql_words()}) AS dl,
         unnest({_sql_words()}) AS term
  FROM docs
),
tf AS (
  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, dl, term
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_sql_words()})) AS DOUBLE) / count(*) AS avgdl
  FROM docs
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
lex_scored AS (
  SELECT q.query_id, t.doc_id,
         round(sum(
           ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * ({BM25_K1} + 1.0))
           / (CAST(tf AS DOUBLE)
              + {BM25_K1} * (1.0 - {BM25_B}
                             + {BM25_B} * CAST(dl AS DOUBLE) / avgdl))
         ), 6) AS score
  FROM tf t
  JOIN qterms q USING (term)
  JOIN dfreq USING (term)
  CROSS JOIN stats
  WHERE t.doc_id <> q.query_id
  GROUP BY q.query_id, t.doc_id
),
lex AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
  FROM lex_scored
  QUALIFY lex_rank <= {LEX_TOP_K}
),
knn AS ({KNN_SQL}),
cos AS (
  -- best rank per doc: multiset scoring can keep two payload copies
  -- of a re-ingested vec_id in the top-K; a ranking is a set of docs
  SELECT query_id, neighbor_id AS doc_id,
         CAST(min(rank) AS BIGINT) AS cos_rank
  FROM knn GROUP BY query_id, neighbor_id
),
fused AS (
  SELECT coalesce(l.query_id, c.query_id) AS query_id,
         coalesce(l.doc_id, c.doc_id) AS doc_id,
         l.lex_rank IS NOT NULL AS in_lex,
         c.cos_rank IS NOT NULL AS in_cos,
         round(coalesce(1.0 / ({RRF_K0} + CAST(l.lex_rank AS DOUBLE)),
                        0.0)
               + coalesce(1.0 / ({RRF_K0} + CAST(c.cos_rank AS DOUBLE)),
                          0.0), 6) AS rrf
  FROM lex l FULL OUTER JOIN cos c
    ON l.query_id = c.query_id AND l.doc_id = c.doc_id
)
SELECT query_id, doc_id, in_lex, in_cos, rrf, rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk
  FROM fused
) t WHERE rk <= {RRF_TOP_K}
"""


QUERIES = {
    "bm25_topk_retrieval": bm25_topk_retrieval,
    "bm25_incremental_scoring": bm25_incremental_scoring,
    "chi2_discriminative_terms": chi2_discriminative_terms,
    "bm25_ndcg_report": bm25_ndcg_report,
    "hybrid_rrf_retrieval": hybrid_rrf_retrieval,
}

ORACLE = {
    "bm25_topk_retrieval": BM25_SQL,
    "bm25_incremental_scoring": BM25_INCR_SQL,
    "chi2_discriminative_terms": CHI2_SQL,
    "bm25_ndcg_report": NDCG_SQL,
    "hybrid_rrf_retrieval": _hybrid_rrf_oracle_sql(),
}


# --------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing (round 10): the
# language-modeling ranker (Zhai & Lafferty 2001) next to BM25 — the
# second classical baseline every retrieval eval reports, and the one
# whose smoothing ties scores to COLLECTION statistics rather than
# per-term idf.  Scored in the rank-equivalent decomposition
#
#   score(d) = sum_{t in q, tf>0} ln(1 + tf * |C| / (MU * ctf_t))
#            + q_eff * ln(MU / (dl + MU))
#
# (ctf_t = collection frequency, |C| = total corpus tokens, q_eff =
# query terms present in the collection; absent terms drop on both
# engines, the standard convention) — so the matching part touches
# only NONZERO postings and the background part needs only per-doc
# length: no doc x term cross ever materializes.  Every doc gets a
# score (background-only when it matches nothing), top-K cut like
# BM25.
#
# Scale shape: the postings filter lands before the (doc, term)
# aggregate exactly as bm25_topk (constant query-term set pushed into
# the scan); ctf / |C| / q_eff are broadcast 1-row/4-row aggregates;
# the per-doc assembly is one doc-keyed left join of two linear
# streams; the global top-K is orderBy+limit (TakeOrderedAndProject).
# tf/ctf/dl/|C| stay exact int64 until the one ln() expression,
# written identically on both engines; scores round(,6) before the
# rank cut with doc_id tiebreaks.
# --------------------------------------------------------------------------
QL_MU = 2000.0
QL_TOP_K = 25


def ql_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10 restructure (same results, unchanged oracle): the old shape
    # ran FOUR corpus tokenize passes (ctf fence, coll fence, match,
    # scored) plus three fence jobs and a doc-keyed left join.  With
    # the constant query-term counts in-row (_qterm_counts), pass 1
    # reduces (c_total, ctf_t, q_eff) into ONE broadcast row and pass
    # 2 scores every doc in-row — two passes, zero fences, zero keyed
    # exchanges; the matching part still touches only nonzero counts
    # (the CASE guard, which also keeps the ctf_t = 0 division out of
    # the plan's reachable arithmetic).
    docs = docs_canon(spark, sf_dir, spread=True).where(F.col("text").isNotNull())
    cnt = _qterm_counts(docs)
    nq = len(QUERY_TERMS)
    stats = cnt.agg(
        F.sum("dl").cast("bigint").alias("c_total"),
        *[
            F.sum(F.col(f"tf_{i}")).cast("bigint").alias(f"ctf_{i}")
            for i in range(nq)
        ],
    ).selectExpr(
        "c_total",
        *[f"ctf_{i}" for i in range(nq)],
        "CAST("
        + " + ".join(f"(CASE WHEN ctf_{i} > 0 THEN 1 ELSE 0 END)" for i in range(nq))
        + " AS BIGINT) AS q_eff",
    )
    m_terms = [
        F.when(
            F.col(f"tf_{i}") > 0,
            F.log(
                F.lit(1.0)
                + F.col(f"tf_{i}").cast("double")
                * F.col("c_total").cast("double")
                / (F.lit(QL_MU) * F.col(f"ctf_{i}").cast("double"))
            ),
        ).otherwise(F.lit(0.0))
        for i in range(nq)
    ]
    m = m_terms[0]
    for t in m_terms[1:]:
        m = m + t
    scored = (
        cnt.join(F.broadcast(stats))
        .select("doc_id", "dl", m.alias("m"), "q_eff")
        .selectExpr(
            "doc_id",
            f"""round(coalesce(m, 0.0)
                      + CAST(q_eff AS DOUBLE)
                        * ln({QL_MU} / (CAST(dl AS DOUBLE) + {QL_MU})),
                      6) + 0.0 AS score""",
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(QL_TOP_K)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return scored.withColumn("rk", F.row_number().over(w).cast("bigint"))


QL_SQL = f"""
WITH docs AS (
  SELECT doc_id, text FROM {DOCS_CANON_SQL} d WHERE text IS NOT NULL
),
dldocs AS (
  SELECT doc_id, CAST(len({_sql_words()}) AS BIGINT) AS dl FROM docs
),
toks AS (
  SELECT doc_id, unnest({_sql_words()}) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE term IN ({_TERMS_IN})
  GROUP BY doc_id, term
),
ctf AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY term
),
coll AS (
  SELECT CAST(sum(dl) AS BIGINT) AS c_total FROM dldocs
),
qeff AS (
  SELECT CAST(count(*) AS BIGINT) AS q_eff FROM ctf
),
match AS (
  SELECT doc_id,
         sum(ln(1.0 + CAST(tf AS DOUBLE) * CAST(c_total AS DOUBLE)
                      / ({QL_MU} * CAST(ctf AS DOUBLE)))) AS m
  FROM tf JOIN ctf USING (term) CROSS JOIN coll
  GROUP BY doc_id
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         AS rk
FROM (
  SELECT d.doc_id,
         round(coalesce(m, 0.0)
               + CAST(q_eff AS DOUBLE)
                 * ln({QL_MU} / (CAST(dl AS DOUBLE) + {QL_MU})),
               6) + 0.0 AS score
  FROM dldocs d
  LEFT JOIN match USING (doc_id)
  CROSS JOIN qeff
  ORDER BY score DESC, d.doc_id
  LIMIT {QL_TOP_K}
) t
"""


QUERIES["ql_dirichlet_topk"] = ql_dirichlet_topk
ORACLE["ql_dirichlet_topk"] = QL_SQL


# --------------------------------------------------------------------------
# RM3 pseudo-relevance-feedback expansion (round 10): the classic
# query-expansion step (Lavrenko & Croft relevance models, the
# Anserini-default "RM3" interpolation) over the module's fixed probe
# query — the op a retrieval stack runs between first-pass BM25 and
# the re-ranked second pass.  From the top FB_DOCS feedback documents
# of bm25_topk_retrieval:
#
#   RM1(t) = sum_d w_d * tf_{t,d} / dl_d      (ML term model per doc,
#            w_d = score_d / sum score        BM25-score-normalized)
#   RM3(t) = RM3_LAMBDA * P_q(t) + (1 - RM3_LAMBDA) * RM1(t)
#            (P_q uniform over the probe terms)
#
# emitting the top FB_TERMS expansion terms.  Deterministic: feedback
# ranks/scores follow the shipped bm25 contract (rounded scores,
# doc_id tiebreaks), tf/dl are exact ints, w_d is a ratio of rounded
# doubles, and the final ranking orders by the ROUNDED RM3 weight
# with a term tiebreak.
#
# Scale shape: the feedback set is FB_DOCS rows (broadcast); the
# corpus token stream joins against it BEFORE any aggregate, so the
# only corpus-sized work is that one filtered tokenize pass; the term
# model aggregates bounded (10-doc) postings, and the final cut is
# orderBy+limit (TakeOrderedAndProject).  The sum-of-scores
# normalizer is a fenced 1-row aggregate (multi-consumer).
# --------------------------------------------------------------------------
FB_DOCS = 10
FB_TERMS = 20
RM3_LAMBDA = 0.5


def rm3_expansion_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10: spread=False — this read broadcast-joins down to the
    # FB_DOCS feedback docs immediately, so the round-robin spread
    # exchanged the WHOLE corpus text column to keep 10 rows (the
    # tokenize fan-out the spread exists for never sees more than
    # FB_DOCS docs).  Interleaved A/B solo: min exec 1.15 spread vs
    # 0.39 plain.  (bm25_topk_retrieval inside the fb fence keeps its
    # own measured spread win.)
    docs = docs_canon(spark, sf_dir).where(F.col("text").isNotNull())
    fb = fenced(
        bm25_topk_retrieval(spark, sf_dir)
        .where(F.col("rk") <= FB_DOCS)
        .select("doc_id", "score")
    )
    # r11 batch 4: single-consumer 1-row aggregate over the already-
    # fenced 10-row fb — its former fence bought no reuse and cost one
    # construction job per call (batch 3's single-consumer argument)
    norm = fb.agg(F.sum("score").alias("sum_score"))
    toks = docs.join(F.broadcast(fb), "doc_id").select(
        "doc_id",
        "score",
        F.size(_words(F.col("text"))).cast("bigint").alias("dl"),
        F.explode(_words(F.col("text"))).alias("term"),
    )
    rm1 = (
        toks.where(F.col("term") != "")
        .groupBy("doc_id", "score", "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .join(F.broadcast(norm))
        .groupBy("term")
        .agg(
            F.sum(
                (F.col("score") / F.expr("nullif(sum_score, 0.0)"))
                * F.col("tf").cast("double")
                / F.col("dl").cast("double")
            ).alias("rm1_raw")
        )
    )
    in_q = F.col("term").isin(*QUERY_TERMS)
    return (
        rm1.select(
            "term",
            in_q.alias("in_query"),
            F.round("rm1_raw", 6).alias("rm1_weight"),
            F.round(
                F.lit(RM3_LAMBDA)
                * F.when(in_q, F.lit(1.0 / len(QUERY_TERMS))).otherwise(
                    F.lit(0.0)
                )
                + F.lit(1.0 - RM3_LAMBDA) * F.col("rm1_raw"),
                6,
            ).alias("rm3_weight"),
        )
        .orderBy(F.col("rm3_weight").desc(), F.col("term").asc())
        .limit(FB_TERMS)
    )


RM3_SQL = f"""
WITH bm25 AS ({{bm25}}),
fb AS (
  SELECT doc_id, score FROM bm25 WHERE rk <= {FB_DOCS}
),
norm AS (SELECT sum(score) AS sum_score FROM fb),
docs AS (
  SELECT doc_id, text FROM {DOCS_CANON_SQL} d WHERE text IS NOT NULL
),
toks AS (
  SELECT f.doc_id, f.score,
         CAST(len({_sql_words()}) AS BIGINT) AS dl,
         unnest({_sql_words()}) AS term
  FROM docs JOIN fb f USING (doc_id)
),
tf AS (
  SELECT doc_id, score, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE term <> ''
  GROUP BY doc_id, score, dl, term
),
rm1 AS (
  SELECT term,
         sum((score / nullif(sum_score, 0.0))
             * CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE)) AS rm1_raw
  FROM tf CROSS JOIN norm
  GROUP BY term
)
SELECT term,
       term IN ({_TERMS_IN}) AS in_query,
       round(rm1_raw, 6) AS rm1_weight,
       round({RM3_LAMBDA} * (CASE WHEN term IN ({_TERMS_IN})
                                  THEN {1.0 / len(QUERY_TERMS)}
                                  ELSE 0.0 END)
             + {1.0 - RM3_LAMBDA} * rm1_raw, 6) AS rm3_weight
FROM rm1
ORDER BY rm3_weight DESC, term
LIMIT {FB_TERMS}
""".format(bm25=BM25_SQL.strip())


QUERIES["rm3_expansion_terms"] = rm3_expansion_terms
ORACLE["rm3_expansion_terms"] = RM3_SQL
