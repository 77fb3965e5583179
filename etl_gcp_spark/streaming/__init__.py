from etl_gcp_spark.streaming.events import (
    run_streaming_dedup,
    run_streaming_hourly_counts,
    run_streaming_sessions,
)

__all__ = [
    "run_streaming_dedup",
    "run_streaming_hourly_counts",
    "run_streaming_sessions",
]
