"""Bucketed (pre-shuffled) table layout — Spark's co-located join.

The one shuffle every fact-fact join pays (`lineitem JOIN orders ON
orderkey`) disappears when BOTH tables are written bucketed on the join
key: `bucketBy(n, key)` hash-partitions rows into a fixed bucket count
at WRITE time and records the spec in the catalog, so the join's
Exchange is satisfied by the layout and the plan is scan -> sort ->
SortMergeJoin with NO Exchange on either side. At 100 TB this is the
difference between re-shuffling the two largest tables on every query
and paying that shuffle once at ingest — the same pay-at-write
philosophy as `layout.write_zordered` (clustered scans) and the IVF
cell layout (pruned vector search).

`bucketed_colocated_join` is the oracle-gated demonstration: revenue
per order priority through a lineitem-orders join over session-built
bucketed tables. The result is layout-independent (the oracle is a
plain join), the PLAN is what the layout buys —
`tests/test_plans.py::test_bucketed_join_no_exchange` pins zero
Exchange operators in the join stage.

Bucket metadata lives in the session catalog (in-memory catalog in the
driver's vanilla session), so tables are (re)built once per session
under a session-private scratch path — no cross-session file races;
`spark.catalog.tableExists` makes repeat calls free within a session.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stac_geoparquet_spark.operators.relational import _dsum, _t

N_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = N_BUCKETS,
    path: str | None = None,
) -> None:
    """Write ``df`` as a parquet table bucketed (and sorted) on
    ``bucket_col``. Spark requires a catalog table for bucketing —
    the spec is metadata, not a file property."""
    spark = df.sparkSession
    if path is None:
        app = spark.sparkContext.applicationId
        path = os.path.join(tempfile.gettempdir(), f"sgs_bucketed_{app}", table)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(table)
    )


def _ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    # Key the session tables on the FULL path plus each source file's
    # (mtime, size) — two data dirs sharing a basename must not alias
    # to one table, and a regenerated source file under the same path
    # must get fresh bucketed copies, not silently stale ones (same
    # freshness contract as _io.layout_scratch_path).
    import hashlib

    from stac_geoparquet_spark.operators._io import source_stamp

    stamps = [
        source_stamp(os.path.join(os.path.abspath(sf_dir), f"{t}.parquet"))
        for t in ("lineitem", "orders")
    ]
    key = f"{os.path.abspath(sf_dir)}|{'|'.join(stamps)}"
    tag = hashlib.md5(key.encode()).hexdigest()[:10]
    li_name = f"sgs_lineitem_b{N_BUCKETS}_{tag}"
    ord_name = f"sgs_orders_b{N_BUCKETS}_{tag}"
    if not spark.catalog.tableExists(li_name):
        write_bucketed(
            _t(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            li_name,
            "l_orderkey",
        )
    if not spark.catalog.tableExists(ord_name):
        write_bucketed(
            _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
            ord_name,
            "o_orderkey",
        )
    return li_name, ord_name


def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority via a ZERO-exchange fact-fact join:
    both sides read from bucketed tables whose layout already satisfies
    the join's hash distribution. The merge hint forces the sort-merge
    path so the demonstration does not degrade to a broadcast at small
    sf (at real scale neither side fits a broadcast anyway); the ONLY
    exchange in the whole plan is the final 5-row aggregation's."""
    li_name, ord_name = _ensure_bucketed_tables(spark, sf_dir)
    li = spark.table(li_name).hint("merge")
    orders = spark.table(ord_name).hint("merge")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


BUCKETED_JOIN_SQL = """
SELECT o_orderpriority,
       count(*) AS n_items,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


QUERIES = {
    "bucketed_colocated_join": bucketed_colocated_join,
}

ORACLE = {
    "bucketed_colocated_join": BUCKETED_JOIN_SQL,
}
