from stac_geoparquet_spark.stac.forward import (
    normalize_items,
    parse_stac_ndjson_to_geoparquet,
    read_items,
)
from stac_geoparquet_spark.stac.inverse import to_item_dicts, to_json_shape

__all__ = [
    "read_items",
    "normalize_items",
    "parse_stac_ndjson_to_geoparquet",
    "to_json_shape",
    "to_item_dicts",
]
