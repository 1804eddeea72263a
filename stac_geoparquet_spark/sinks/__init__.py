from stac_geoparquet_spark.sinks.geoparquet import read_geoparquet_metadata, to_geoparquet

__all__ = ["to_geoparquet", "read_geoparquet_metadata"]
