"""Registry-wide output-schema contract.

The driver's correctness harness canonicalizes every query result with
pandas (sort_values over all columns, then a value hash).  Python lists
and dicts are unhashable, so a top-level array/map/struct column crashes
the canonicalizer and red-rows the query even when Spark and the oracle
agree (round-2 `embedding_quantize_int8`).  Every registered query must
therefore return a scalar-only schema — join arrays to CSV strings or
explode them before returning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tests.conftest import SF_DIR


def _names():
    import __spark_entry__ as entry

    return sorted(entry.queries())


@pytest.mark.parametrize("name", _names())
def test_query_output_schema_is_scalar_only(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: top-level non-scalar columns {bad} — the driver "
        "canonicalizer cannot hash them; array_join/explode first"
    )
    # registry-wide plan anti-pattern sweep (piggybacked on the same
    # DataFrame build): no query may plan a cartesian product or a
    # row-at-a-time Python UDF.  Broadcast 1-row-aggregate crossjoins
    # (BroadcastNestedLoopJoin) and tiny global aggregates
    # (SinglePartition) are the blessed exceptions and not flagged.
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF — use built-ins or an "
        "Arrow-batched pandas path"
    )
