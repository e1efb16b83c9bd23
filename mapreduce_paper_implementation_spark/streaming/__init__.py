from mapreduce_paper_implementation_spark.streaming.events import (
    run_to_memory,
    session_counts,
    stream_events,
    user_running_counts,
    windowed_counts,
)

__all__ = [
    "stream_events",
    "windowed_counts",
    "session_counts",
    "user_running_counts",
    "run_to_memory",
]
