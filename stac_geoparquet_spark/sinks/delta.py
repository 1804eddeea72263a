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


def delta_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.spark.sql.delta.DeltaLog  # noqa: B018
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
    (
        df.write.format("delta")
        .mode(mode)
        .option("userMetadata", json.dumps({"geo": geo, "stac-geoparquet": stac}))
        .save(path)
    )
