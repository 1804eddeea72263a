"""NaN-measure axis: the differential probe that injected NaN into
lineitem measures and event values crashed 22 DuckDB oracles outright
(`CAST(NaN AS DECIMAL)` is an error in DuckDB while Spark's
decimal-exact pipelines silently propagate) — cross-engine agreement
on NaN measures is unachievable by construction, so the adopted
contract is GATE, not redefine: NaN in a measure column is corrupt
data that `dq_report` / `dq_corpus_report` must flag before promotion,
and every analytic operator assumes the gate ran.  This file pins
both halves: the gates detect exactly the injected rows (and stay
oracle-green on the corrupted tables themselves), and the clean
driver tables carry zero NaN so the assumption holds there.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest


@pytest.fixture(scope="module")
def nan_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_nan_measures")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
              l_quantity,
              CASE WHEN (l_orderkey + l_linenumber) % 31 = 4
                   THEN CAST('NaN' AS DOUBLE) ELSE l_extendedprice
              END AS l_extendedprice,
              CASE WHEN (l_orderkey + l_linenumber) % 37 = 6
                   THEN CAST('NaN' AS DOUBLE) ELSE l_discount
              END AS l_discount,
              l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{src}/lineitem.parquet'))
          TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT event_id, ts, user_id, event_type,
              CASE WHEN event_id % 41 = 8 THEN CAST('NaN' AS DOUBLE)
                   ELSE value END AS value, props
            FROM read_parquet('{src}/events.parquet'))
          TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in ("documents", "embeddings", "orders", "customer", "supplier",
              "part", "nation", "region"):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", ["dq_report", "dq_corpus_report"])
def test_gates_stay_oracle_green_on_nan_data(spark, nan_dir, name):
    """The gate queries themselves must run — and agree cross-engine —
    on the very data they are gating."""
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(q[name](spark, nan_dir), o[name], nan_dir, strict=True)
    assert ok, f"{name}: {msg}"


def test_dq_report_detects_nan_measures(spark, nan_dir):
    from stac_geoparquet_spark.operators.quality import dq_report

    rows = {r["check"]: r for r in dq_report(spark, nan_dir).collect()}
    assert rows["finite_measures"]["failed"] > 0
    # the count is exact: recompute the injection predicate directly
    exp = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{nan_dir}/lineitem.parquet')
            WHERE isnan(l_extendedprice) OR isnan(l_discount)"""
    ).fetchone()[0]
    assert rows["finite_measures"]["failed"] == exp


def test_dq_corpus_report_detects_nan_event_values(spark, nan_dir):
    from stac_geoparquet_spark.operators.quality import dq_corpus_report

    rows = {r["check"]: r for r in dq_corpus_report(spark, nan_dir).collect()}
    exp = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{nan_dir}/events.parquet')
            WHERE isnan(value)"""
    ).fetchone()[0]
    assert exp > 0
    assert rows["event_nan_value"]["failed"] == exp


def test_driver_tables_are_nan_free(spark):
    """The gate's clean-data baseline: zero NaN anywhere the analytic
    operators read a float measure."""
    from stac_geoparquet_spark.operators.quality import (
        dq_corpus_report,
        dq_report,
    )

    sf = "/root/testdata/sf0.001"
    r = {x["check"]: x["failed"] for x in dq_report(spark, sf).collect()}
    c = {x["check"]: x["failed"] for x in dq_corpus_report(spark, sf).collect()}
    assert r["finite_measures"] == 0
    assert c["event_nan_value"] == 0


@pytest.fixture(scope="module")
def oob_dir(tmp_path_factory):
    """Out-of-envelope measures: huge magnitudes and +/-Infinity —
    outside |x| <= 1e12 the operators' exact-int64 cent/moment bounds
    no longer hold (Spark int64 sums can wrap where DuckDB's HUGEINT
    keeps going), so the dq gate must flag these rows up front."""
    import shutil

    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_oob")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * REPLACE (
              CASE WHEN l_orderkey % 31 = 4 THEN 1e15
                   WHEN l_orderkey % 37 = 6 THEN CAST('Infinity' AS DOUBLE)
                   ELSE l_extendedprice END AS l_extendedprice)
            FROM read_parquet('{src}/lineitem.parquet'))
          TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT event_id, ts, user_id, event_type,
              CASE WHEN event_id % 41 = 8 THEN -1e14 ELSE value END AS value,
              props
            FROM read_parquet('{src}/events.parquet'))
          TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in ("documents", "embeddings", "orders", "customer", "supplier",
              "part", "nation", "region"):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", ["dq_report", "dq_corpus_report"])
def test_gates_stay_oracle_green_on_oob_data(spark, oob_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(q[name](spark, oob_dir), o[name], oob_dir, strict=True)
    assert ok, f"{name}: {msg}"


def test_dq_reports_detect_oob_magnitudes(spark, oob_dir):
    from stac_geoparquet_spark.operators.quality import (
        dq_corpus_report,
        dq_report,
    )

    r = {x["check"]: x for x in dq_report(spark, oob_dir).collect()}
    exp = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{oob_dir}/lineitem.parquet')
            WHERE abs(l_extendedprice) > 1e12"""
    ).fetchone()[0]
    assert exp > 0
    assert r["measure_magnitude"]["failed"] == exp
    c = {x["check"]: x for x in dq_corpus_report(spark, oob_dir).collect()}
    cexp = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{oob_dir}/events.parquet')
            WHERE abs(value) > 1e12"""
    ).fetchone()[0]
    assert cexp > 0
    assert c["event_value_magnitude"]["failed"] == cexp


def test_driver_tables_are_in_envelope(spark):
    from stac_geoparquet_spark.operators.quality import (
        dq_corpus_report,
        dq_report,
    )

    sf = "/root/testdata/sf0.001"
    r = {x["check"]: x["failed"] for x in dq_report(spark, sf).collect()}
    c = {x["check"]: x["failed"] for x in dq_corpus_report(spark, sf).collect()}
    assert r["measure_magnitude"] == 0
    assert c["event_value_magnitude"] == 0
