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
        if v == 0.0 and math.copysign(1.0, v) < 0:
            # The driver's value-hash distinguishes -0.0 from 0.0 (the
            # r04 embedding_covariance red row), so the local gate must
            # too.  Rendered as a distinct token so compare() can also
            # sweep for it: a query that emits -0.0 at all is flaky,
            # because the sign of a cancelled-to-zero residue depends
            # on partial-sum merge order.
            return "-0"
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


def _norm_arrow_type(t):
    """Collapse Arrow encodings that serialize identically; keep real
    type-family differences (decimal vs int, int vs float) distinct —
    those are exactly what the driver's value-hash is sensitive to
    (round 1: DuckDB sum(BIGINT) -> HUGEINT -> decimal128(38,0) vs
    Spark int64 hash-failed with identical values)."""
    import pyarrow as pa

    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return pa.string()
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return pa.binary()
    if pa.types.is_timestamp(t):
        return pa.timestamp("us")
    if pa.types.is_date(t):
        return pa.date32()
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return pa.list_(_norm_arrow_type(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct(
            [(f.name, _norm_arrow_type(f.type)) for f in t]
        )
    if pa.types.is_decimal(t):
        return pa.decimal128(38, t.scale)
    return t


def _arrow_type_check(s_table, d_table) -> str | None:
    """Strict serialization check: compare the Arrow schema Spark emits
    against the Arrow schema DuckDB emits, column-name-sorted.  Returns
    an error string or None."""
    s_fields = {f.name: f.type for f in s_table.schema}
    d_fields = {f.name: f.type for f in d_table.schema}
    diffs = []
    for name in sorted(s_fields):
        if name not in d_fields:
            continue  # column-name mismatch reported elsewhere
        st = _norm_arrow_type(s_fields[name])
        dt = _norm_arrow_type(d_fields[name])
        if st != dt:
            diffs.append(f"{name}: spark={s_fields[name]} duckdb={d_fields[name]}")
    if diffs:
        return "arrow type mismatch (driver hash would differ): " + "; ".join(diffs)
    return None


def compare(spark_df, sql: str, sf_dir: str, strict: bool = False) -> tuple[bool, str]:
    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [c[0] for c in res.description]
        if strict:
            d_table = res.arrow()
            d_rows = [tuple(r.values()) for r in d_table.to_pylist()]
        else:
            d_table = None
            d_rows = res.fetchall()
    finally:
        con.close()
    s_cols = spark_df.columns
    if strict:
        # ONE Spark job: rows and serialized schema both come from the
        # same toArrow() result (a separate collect() would re-run the
        # whole query)
        s_table = spark_df.toArrow()
        s_rows = [tuple(r.values()) for r in s_table.to_pylist()]
    else:
        s_table = None
        s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    if strict:
        err = _arrow_type_check(s_table, d_table)
        if err:
            return False, err
    # Registry-wide negative-zero sweep on the RAW values (before
    # normalization, so a string that happens to contain "-0" can't
    # false-positive): -0.0 in ANY output is a latent flaky hash
    # (merge-order-dependent sign of a cancelled residue) even when
    # both engines happen to agree this run.
    def _has_negzero(v) -> bool:
        if isinstance(v, float):
            return v == 0.0 and math.copysign(1.0, v) < 0
        if isinstance(v, (list, tuple)):
            return any(_has_negzero(x) for x in v)
        return False

    for side, rows in (("spark", s_rows), ("duckdb", d_rows)):
        for r in rows:
            if any(_has_negzero(cell) for cell in r):
                return False, (
                    f"negative zero in {side} output (flaky rendering "
                    f"— normalize with + 0.0 after rounding): row {r}"
                )
    _, sn = _normalize_rows(s_cols, s_rows)
    _, dn = _normalize_rows(d_cols, d_rows)
    if sn != dn:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(s_rows)} rows)"
