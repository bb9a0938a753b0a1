from breweries_case_spark.streaming.windows import (
    stream_events,
    tumbling_counts,
    sliding_counts,
    session_counts,
    run_stream_to_memory,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "run_stream_to_memory",
]
