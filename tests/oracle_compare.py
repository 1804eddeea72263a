"""Local replica of the driver's Spark-vs-DuckDB correctness check:
run the Spark query and the oracle SQL on the same parquet tables,
sort columns by name, normalize values, and compare order-insensitively.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return "␀NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            from datetime import timezone

            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [c[0] for c in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    _, sn = _normalize_rows(s_cols, s_rows)
    _, dn = _normalize_rows(d_cols, d_rows)
    if sn != dn:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(s_rows)} rows)"
