from miso_spark.streaming.api import (
    dedup_stream,
    stream_events,
    windowed_counts,
    sessionize,
    sessionize_native,
    run_to_memory,
    tee_stream,
)

__all__ = [
    "dedup_stream",
    "stream_events",
    "windowed_counts",
    "sessionize",
    "sessionize_native",
    "run_to_memory",
    "tee_stream",
]
