from miso_spark.streaming.api import (
    stream_events,
    windowed_counts,
    sessionize,
    sessionize_native,
    run_to_memory,
    tee_stream,
)

__all__ = [
    "stream_events",
    "windowed_counts",
    "sessionize",
    "sessionize_native",
    "run_to_memory",
    "tee_stream",
]
