"""Adversarial-fixture oracle sweep (the round-5 bug-finder, checked in).

Re-runs the FULL strict Spark-vs-DuckDB oracle gate under adversarial
rewrites of the sf0.01 tables.  The sf0.001 differential gates in
tests/ are too small to reach estimator regimes (a sketch's K, an LSH
band collision, a percentile buffer past one partition), so order-
statistic and NULL-ordering divergences hide until production scale;
this sweep runs the SAME compare at 10x under the adversarial fixture
axes defined in ``FIXTURES`` below (no hand-written count — the list
is the source of truth) to force those regimes.  Round 5 it found four real cross-engine bugs the
small gates masked (KMV NULL ordering, NULL-key equi-join vs <=>, a
gram index built from the raw rather than canonical corpus, a driver-
side incremental reader not collapsing re-delivered duplicate ids).

Run it at least once per round on every NEW operator before the window
ships (README "Adversarial sweeps" section):

    python tools/sweep_adversarial.py                      # all fixtures, all queries
    python tools/sweep_adversarial.py --fixtures dup_ids,null_text \
        --queries dedup_lines_across_docs,text_readability # targeted
    python tools/sweep_adversarial.py --sf /root/testdata/sf0.001  # faster smoke

Exit code is the number of (fixture, query) failures; FAIL/ERROR lines
go to stdout as they happen.
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

TABLES = (
    "documents",
    "embeddings",
    "orders",
    "lineitem",
    "customer",
    "supplier",
    "part",
    "nation",
    "region",
    "events",
)

# Each fixture maps table -> a DuckDB COPY statement template with
# {src}/{dst} slots; unlisted tables are copied verbatim.  Axes:
#   null_events    NULL ts / user_id / event_type / value
#   null_text      NULL text / lang / source
#   null_vec       NULL embedding / label
#   nan_ragged_vec Inf, NaN and truncated (ragged) vectors
#   dup_ids        duplicate ids with DIFFERENT payloads (canonical-
#                  collapse contract: engines must agree on min-by-id)
#   null_rel       NULL relational keys and dates (join vs GROUP BY
#                  NULL semantics; <=> vs = divergences)
#   constant_keys  every bounded key collapses to ONE value (degenerate
#                  group / skew regime)
#   all_dup_text   the whole corpus is one duplicated text (dedup
#                  estimator saturation)
#   negative_values refunds/credits: negated measures (rounding and
#                  percentile conventions below zero)
#   pre_epoch_ts   whole time axis shifted before the 1970 epoch
#                  (negative epoch us/days: div/mod conventions)
#   constant_ts    every event/order at ONE instant (all-ties regime:
#                  total-order tiebreak contracts)
#   unicode_text   the JVM-vs-utf8proc divergence corpus injected
#                  corpus-wide: Final_Sigma endings, Turkish İ (the
#                  full-casing expansion), NBSP (non-\s in BOTH
#                  engines), vertical tab (Java \s, not RE2 \s),
#                  combining vs precomposed accents (NFC contract),
#                  ligatures/full-width forms, capital sharp s —
#                  verifies every text operator actually routes
#                  through the patched shared helpers (jlower /
#                  _sql_lower / SQL_WS / jtrim), not ad-hoc lower()/
#                  trim()/\s
FIXTURES: dict[str, dict[str, str]] = {
    "null_events": {
        "events": """COPY (SELECT event_id,
    CASE WHEN event_id % 17 = 0 THEN NULL ELSE ts END AS ts,
    CASE WHEN event_id % 19 = 0 THEN NULL ELSE user_id END AS user_id,
    CASE WHEN event_id % 23 = 0 THEN NULL ELSE event_type END AS event_type,
    CASE WHEN event_id % 29 = 0 THEN NULL ELSE value END AS value,
    props FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
    },
    "null_text": {
        "documents": """COPY (SELECT doc_id,
    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END AS text,
    CASE WHEN doc_id % 31 = 0 THEN NULL ELSE lang END AS lang,
    CASE WHEN doc_id % 37 = 0 THEN NULL ELSE source END AS source,
    n_chars FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
    },
    "null_vec": {
        "embeddings": """COPY (SELECT vec_id,
    CASE WHEN vec_id % 11 = 0 THEN NULL ELSE embedding END AS embedding,
    CASE WHEN vec_id % 13 = 0 THEN NULL ELSE label END AS label
    FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
    },
    "nan_ragged_vec": {
        "embeddings": """COPY (SELECT vec_id,
    CASE WHEN vec_id % 11 = 0 THEN list_transform(embedding, x -> x / 0.0)
         WHEN vec_id % 13 = 0 THEN embedding[1:17]
         WHEN vec_id % 17 = 0 THEN list_transform(embedding,
              x -> CASE WHEN x > 0 THEN 'nan'::FLOAT ELSE x END)
         ELSE embedding END AS embedding, label
    FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
    },
    "dup_ids": {
        "documents": """COPY (SELECT * FROM read_parquet('{src}')
      UNION ALL BY NAME
      SELECT d.* REPLACE (upper(d.text) AS text)
      FROM read_parquet('{src}') d WHERE d.doc_id % 7 = 0)
      TO '{dst}' (FORMAT PARQUET)""",
        "embeddings": """COPY (SELECT * FROM read_parquet('{src}')
      UNION ALL BY NAME
      SELECT v.* REPLACE (list_transform(v.embedding, x -> -x) AS embedding)
      FROM read_parquet('{src}') v WHERE v.vec_id % 5 = 0)
      TO '{dst}' (FORMAT PARQUET)""",
    },
    "null_rel": {
        "orders": """COPY (SELECT * REPLACE (
      CASE WHEN o_orderkey % 41 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
      CASE WHEN o_orderkey % 43 = 0 THEN NULL ELSE o_orderdate END
        AS o_orderdate)
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
        "lineitem": """COPY (SELECT * REPLACE (
      CASE WHEN l_orderkey % 37 = 0 THEN NULL ELSE l_shipdate END
        AS l_shipdate,
      CASE WHEN (l_orderkey + l_linenumber) % 31 = 0 THEN NULL
        ELSE l_discount END AS l_discount)
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
    },
    "constant_keys": {
        "documents": """COPY (SELECT doc_id, text, 'xx' AS lang,
      'one' AS source, n_chars
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
        "events": """COPY (SELECT event_id, ts, 1 AS user_id,
      'view' AS event_type, value, props
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
    },
    "all_dup_text": {
        "documents": """COPY (SELECT doc_id,
      (SELECT text FROM read_parquet('{src}') WHERE doc_id = 3) AS text,
      lang, source, n_chars
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
    },
    # negative money/measure values (refunds, credits, chargebacks):
    # the axis that exposed the CUPED truncate-vs-floor integer-
    # division divergence (Spark `div` truncates toward zero, DuckDB
    # `//` floors — they disagree exactly on negative operands), and
    # the regime where HALF_UP rounding and percentile cuts must hold
    # their conventions below zero
    "negative_values": {
        "events": """COPY (SELECT event_id, ts, user_id, event_type,
      CASE WHEN event_id % 3 = 0 THEN -value * 7 ELSE value END AS value,
      props FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
        "orders": """COPY (SELECT * REPLACE (
      CASE WHEN o_orderkey % 5 = 0 THEN -o_totalprice ELSE o_totalprice END
        AS o_totalprice)
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
        "lineitem": """COPY (SELECT * REPLACE (
      CASE WHEN (l_orderkey + l_linenumber) % 7 = 0 THEN -l_extendedprice
        ELSE l_extendedprice END AS l_extendedprice)
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
    },
    # the whole time axis shifted before the 1970 epoch (archival /
    # backfilled corpora): negative epoch microseconds and epoch days
    # exercise every `div`-vs-`//` bucketing, mod-anchored weekday /
    # hour-of-week slot, and date-diff sign convention the modern
    # fixtures never reach
    "pre_epoch_ts": {
        "events": """COPY (SELECT event_id,
      ts - INTERVAL 70 YEARS AS ts, user_id, event_type, value, props
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
        "orders": """COPY (SELECT * REPLACE (
      o_orderdate - INTERVAL 70 YEARS AS o_orderdate)
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
        "lineitem": """COPY (SELECT * REPLACE (
      l_shipdate - INTERVAL 70 YEARS AS l_shipdate)
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
    },
    # every event at ONE timestamp, every order/lineitem on ONE date —
    # the all-ties regime: any ordering contract that lacks a total-
    # order tiebreak (lag/lead, carry-forward, session boundaries,
    # as-of matches, top-k cuts) degenerates to engine-dependent
    # nondeterminism here; the axis proves the house rule that every
    # window key is totally ordered
    "unicode_text": {
        "documents": """COPY (SELECT doc_id,
      CASE WHEN text IS NULL THEN text ELSE
        (CASE WHEN doc_id % 7 = 0 THEN 'ΟΔΟΣ ΣΟΦΟΣ Σ ' || text
              ELSE text END)
        || (CASE WHEN doc_id % 11 = 0 THEN ' İstanbul DİŞ İ' ELSE '' END)
        || (CASE WHEN doc_id % 13 = 0 THEN ' x' || chr(160) || 'y'
            ELSE '' END)
        || (CASE WHEN doc_id % 17 = 0 THEN ' a' || chr(11) || 'b'
            ELSE '' END)
        || (CASE WHEN doc_id % 19 = 0 THEN ' cafe' || chr(769) || ' café'
            ELSE '' END)
        || (CASE WHEN doc_id % 23 = 0 THEN ' ﬁnal ＡＢＣ ẞ' ELSE '' END)
      END AS text,
      lang, source, n_chars
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
    },
    "constant_ts": {
        "events": """COPY (SELECT event_id,
      min(ts) OVER () AS ts, user_id, event_type, value, props
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
        "orders": """COPY (SELECT * REPLACE (
      min(o_orderdate) OVER () AS o_orderdate)
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
        "lineitem": """COPY (SELECT * REPLACE (
      min(l_shipdate) OVER () AS l_shipdate)
      FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""",
    },
}


def make_fixture_dir(src: str, overrides: dict[str, str]) -> str:
    import duckdb

    d = tempfile.mkdtemp(prefix="sweep_adv_")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        if t in overrides:
            con.execute(overrides[t].format(src=p, dst=f"{d}/{t}.parquet"))
        else:
            shutil.copy(p, f"{d}/{t}.parquet")
    con.close()
    return d


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--fixtures",
        default=",".join(FIXTURES),
        help="comma-separated fixture names (default: all)",
    )
    ap.add_argument(
        "--queries",
        default="",
        help="comma-separated query names (default: every registered query)",
    )
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from tests.oracle_compare import compare

    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    names = (
        [n.strip() for n in args.queries.split(",") if n.strip()]
        if args.queries
        else sorted(q)
    )
    unknown = [n for n in names if n not in q]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    total_fails = 0
    for fx in [f.strip() for f in args.fixtures.split(",") if f.strip()]:
        if fx not in FIXTURES:
            ap.error(f"unknown fixture {fx!r} (have: {sorted(FIXTURES)})")
        d = make_fixture_dir(args.sf, FIXTURES[fx])
        fails = 0
        for name in names:
            try:
                df = q[name](spark, d)
                if name in o:
                    ok, msg = compare(df, o[name], d, strict=True)
                    if not ok:
                        fails += 1
                        print("FAIL", fx, name, msg[:250], flush=True)
                else:
                    df.count()  # rows-only queries: just must not crash
            except Exception as ex:  # noqa: BLE001 - report and continue
                fails += 1
                print("ERROR", fx, name, str(ex)[:200], flush=True)
        print(f"{fx} done, fails: {fails}", flush=True)
        total_fails += fails
        shutil.rmtree(d, ignore_errors=True)
    print(f"TOTAL fails: {total_fails}", flush=True)
    return min(total_fails, 125)


if __name__ == "__main__":
    sys.exit(main())
