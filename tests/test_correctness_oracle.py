"""Run every declared query against its DuckDB oracle at sf0.001 —
the same check the driver performs at sf0.01."""

import pytest

from tests.oracle_compare import compare


def _pairs():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, sf_dir, name, fn, sql):
    df = fn(spark, sf_dir)
    assert df is not None
    if sql is None:
        # non-SQL-expressible op: weaker rows-only check
        assert df.count() >= 0
        return
    ok, msg = compare(df, sql, sf_dir)
    assert ok, f"{name}: {msg}"
