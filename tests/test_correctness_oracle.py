"""Run every declared query against its DuckDB oracle at sf0.01 in
strict Arrow-serialization mode — the same scale AND the same
serialization sensitivity as the driver's gate (round 1 lesson: the
driver hash-fails on DuckDB HUGEINT vs Spark int64 even when values
match, so the local gate must compare Arrow types, not just values).

Override the scale with SPARK_GRAFT_ORACLE_SF_DIR for quick runs.
"""

import os

import pytest

from tests.oracle_compare import compare

ORACLE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)


def _pairs():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, name, fn, sql):
    df = fn(spark, ORACLE_SF_DIR)
    assert df is not None
    if sql is None:
        # non-SQL-expressible op: weaker rows-only check
        assert df.count() >= 0
        return
    ok, msg = compare(df, sql, ORACLE_SF_DIR, strict=True)
    assert ok, f"{name}: {msg}"
