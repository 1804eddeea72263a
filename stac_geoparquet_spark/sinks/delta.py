"""Delta Lake sink (K2) — the reference's
parse_stac_ndjson_to_delta_lake (stac_geoparquet/arrow/_delta_lake.py:
28-71) writes the normalized table with the `geo` / `stac-geoparquet`
metadata and refuses null-typed columns (docs/usage.md:59-69).

On Spark this is `df.write.format("delta")` with the metadata carried
as table properties (Delta has first-class table metadata, unlike raw
parquet footers). delta-spark is not installed in this environment, so
the write is gated behind availability detection; the *validation*
(the null-type trap that motivates the reference's schema patching,
SURVEY.md §7.3) is pure and always active.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from stac_geoparquet_spark.sinks.geoparquet import (
    build_geo_metadata,
    build_stac_metadata,
)


def _null_typed_columns(
    dt: T.DataType, path: str = ""
) -> list[str]:
    """Paths of NullType fields — Delta rejects void columns exactly as
    the reference's rust engine does (arrow/_delta_lake.py:50-57), so
    surface them before the write with the same remedy (cast via the
    schema patcher in stac.forward)."""
    out: list[str] = []
    if isinstance(dt, T.NullType):
        return [path or "<root>"]
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            out += _null_typed_columns(
                f.dataType, f"{path}.{f.name}" if path else f.name
            )
    elif isinstance(dt, T.ArrayType):
        out += _null_typed_columns(dt.elementType, path + "[]")
    elif isinstance(dt, T.MapType):
        out += _null_typed_columns(dt.valueType, path + "{}")
    return out


def sql_string_literal(v: str) -> str:
    """Escape ``v`` for interpolation into a single-quoted Spark SQL
    string literal: Spark processes BACKSLASH escapes (not ''-doubling),
    so backslashes must be doubled before quotes are escaped."""
    return v.replace("\\", "\\\\").replace("'", "\\'")


def delta_available(spark: SparkSession) -> bool:
    """True iff the Delta JVM classes are actually loadable.

    Bare py4j attribute access (``spark._jvm.org...DeltaLog``) can NOT
    be used here: an unknown dotted path resolves to a JavaPackage
    object without raising, so that check is always-True.  Class.forName
    raises ClassNotFoundException for real."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.delta.DeltaLog"
        )
        return True
    except Exception:
        return False


def to_delta(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    collections: list[str] | None = None,
) -> None:
    """Write a normalized STAC DataFrame as a Delta table, stamping the
    geo + stac-geoparquet metadata as table properties."""
    bad = _null_typed_columns(df.schema)
    if bad:
        raise ValueError(
            "Delta Lake cannot store null-typed columns "
            f"{bad}; cast them first (see stac.forward type patching / "
            "reference docs/usage.md:59-69)"
        )
    spark = df.sparkSession
    if not delta_available(spark):
        raise RuntimeError(
            "delta-spark is not available in this Spark session; install "
            "io.delta:delta-spark and enable DeltaSparkSessionExtension"
        )
    geo = build_geo_metadata(df.schema)
    stac = build_stac_metadata(collections)
    meta = {"stac-geoparquet": stac}
    if geo is not None:
        meta["geo"] = geo
    (
        df.write.format("delta")
        .mode(mode)
        # commit-level provenance (this write's commitInfo entry only)
        .option("userMetadata", json.dumps(meta))
        .save(path)
    )
    # The durable contract ("first-class table metadata") is TABLE
    # properties, not commitInfo — userMetadata lives only in one log
    # entry and is superseded by later commits.  Spark SQL string
    # literals process BACKSLASH escape sequences (not Postgres-style
    # '' doubling), so escape backslashes first and then single quotes
    # — json.dumps output is full of \" sequences that would otherwise
    # be unescaped by the parser into invalid JSON.
    props = ", ".join(
        f"'{sql_string_literal(k)}' = '{sql_string_literal(json.dumps(v))}'"
        for k, v in meta.items()
    )
    spark.sql(f"ALTER TABLE delta.`{path}` SET TBLPROPERTIES ({props})")
