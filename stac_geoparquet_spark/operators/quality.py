"""Data-quality checks — the validation report a pipeline runs before
promoting a dataset (dbt-test style): referential integrity, key
uniqueness, null rates, domain constraints. One row per check with its
violation count, so downstream gating is `WHERE failed > 0`.

The report is ONE lazy DataFrame (a union of 1-row aggregates), not a
driver loop of counts: a single action executes every check, the
independent sub-plans schedule concurrently, and the report composes
like any other query (filter/join/write).

Scale shape per check family:
- referential integrity: LEFT ANTI join child->parent counted — the
  parent key side broadcasts at dimension sizes and degrades to a
  key-only shuffle join when both sides are large.
- uniqueness: groupBy(key) HAVING count>1 — map-side combine collapses
  unique keys before the shuffle, so shuffled rows ~= duplicate keys.
- null/domain rates: scan-stage conditional aggregates folded into one
  pass per table, no shuffle.

Every check is a plain count under identical SQL semantics in DuckDB,
so the whole report is exactly oracle-gated.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _check_row(name: str, failed: DataFrame, total: DataFrame) -> DataFrame:
    """(check, failed, total) as a lazy 1-row frame from two 1-row
    aggregates."""
    return (
        failed.crossJoin(total)
        .select(
            F.lit(name).alias("check"),
            F.col("failed").cast("bigint"),
            F.col("total").cast("bigint"),
        )
    )


def dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(check, failed, total) across the star schema's core contracts."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))

    n_orders = orders.agg(F.count(F.lit(1)).alias("total"))
    n_li = lineitem.agg(F.count(F.lit(1)).alias("total"))

    fk_cust = (
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("failed"))
    )
    fk_order = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == orders.o_orderkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("failed"))
    )
    dup_orderkey = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where("n > 1")
        .agg(F.count(F.lit(1)).alias("failed"))
    )
    # lineitem scan checks: one pass, then split into report rows
    scan = lineitem.agg(
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias(
            "null_qty"
        ),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
            ).otherwise(0)
        ).alias("bad_discount"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)).alias(
            "bad_price"
        ),
    )

    parts = [
        _check_row("fk_orders_customer", fk_cust, n_orders),
        _check_row("fk_lineitem_orders", fk_order, n_li),
        _check_row("unique_orderkey", dup_orderkey, n_orders),
        _check_row(
            "null_quantity", scan.select(F.col("null_qty").alias("failed")), n_li
        ),
        _check_row(
            "discount_in_unit_interval",
            scan.select(F.col("bad_discount").alias("failed")),
            n_li,
        ),
        _check_row(
            "positive_price",
            scan.select(F.col("bad_price").alias("failed")),
            n_li,
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


DQ_REPORT_SQL = """
SELECT 'fk_orders_customer' AS check,
       (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS failed,
       (SELECT count(*) FROM orders) AS total
UNION ALL
SELECT 'fk_lineitem_orders',
       (SELECT count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
       (SELECT count(*) FROM lineitem)
UNION ALL
SELECT 'unique_orderkey',
       (SELECT count(*) FROM (
          SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1) t),
       (SELECT count(*) FROM orders)
UNION ALL
SELECT 'null_quantity',
       (SELECT count(*) FROM lineitem WHERE l_quantity IS NULL),
       (SELECT count(*) FROM lineitem)
UNION ALL
SELECT 'discount_in_unit_interval',
       (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1),
       (SELECT count(*) FROM lineitem)
UNION ALL
SELECT 'positive_price',
       (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0),
       (SELECT count(*) FROM lineitem)
"""


QUERIES = {
    "dq_report": dq_report,
}

ORACLE = {
    "dq_report": DQ_REPORT_SQL,
}
