from mini_data_platform_spark.streaming.heavyhitters import heavy_hitters_stream
from mini_data_platform_spark.streaming.ingest import start_streaming_ingest
from mini_data_platform_spark.streaming.ivm import maintain_view_stream
from mini_data_platform_spark.streaming.neardup import near_dup_candidates_stream
from mini_data_platform_spark.streaming.run import run_available_now
from mini_data_platform_spark.streaming.windows import (
    dedup_stream,
    session_window_agg,
    sessionize_stateful,
    stream_interval_join,
    windowed_event_stats,
)

__all__ = [
    "start_streaming_ingest",
    "windowed_event_stats",
    "sessionize_stateful",
    "session_window_agg",
    "stream_interval_join",
    "dedup_stream",
    "near_dup_candidates_stream",
    "heavy_hitters_stream",
    "maintain_view_stream",
    "run_available_now",
]
