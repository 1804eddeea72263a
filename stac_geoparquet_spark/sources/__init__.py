from stac_geoparquet_spark.sources import pgstac

__all__ = ["pgstac"]
