"""salted_join semantics: identity with the unsalted join under
negative/NULL salt sources, and the outer-join restriction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stac_geoparquet_spark.operators.skew import salted_join


@pytest.fixture()
def sides(spark):
    big = spark.createDataFrame(
        [
            ("a", -5),
            ("a", None),  # NULL salt source must not drop the row
            ("b", 3),
            ("c", -1),  # no match in small
        ],
        "k string, src int",
    )
    small = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    return big, small


def _rows(df):
    return sorted(
        ((r["k"], r["src"], r["v"]) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_salted_inner_matches_unsalted(spark, sides):
    big, small = sides
    got = salted_join(big, small, on=["k"], salt_src=F.col("src"))
    want = big.join(small, ["k"], "inner")
    assert _rows(got) == _rows(want)


def test_salted_left_matches_unsalted(spark, sides):
    big, small = sides
    got = salted_join(big, small, on=["k"], salt_src=F.col("src"), how="left")
    want = big.join(small, ["k"], "left")
    assert _rows(got) == _rows(want)


def test_outer_joins_rejected(spark, sides):
    big, small = sides
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, on=["k"], salt_src=F.col("src"), how=how)
