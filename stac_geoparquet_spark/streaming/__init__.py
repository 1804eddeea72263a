from stac_geoparquet_spark.streaming.events import (
    stream_events_hourly,
    stream_events_to_sink,
)

__all__ = ["stream_events_hourly", "stream_events_to_sink"]
