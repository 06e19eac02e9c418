from mini_data_platform_spark.streaming.ingest import start_streaming_ingest
from mini_data_platform_spark.streaming.windows import (
    dedup_stream,
    sessionize_stateful,
    windowed_event_stats,
)

__all__ = [
    "start_streaming_ingest",
    "windowed_event_stats",
    "sessionize_stateful",
    "dedup_stream",
]
