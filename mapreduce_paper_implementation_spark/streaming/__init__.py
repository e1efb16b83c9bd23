from mapreduce_paper_implementation_spark.streaming.events import (
    click_purchase_interval_join,
    run_to_memory,
    segment_counts,
    session_counts,
    stream_documents,
    stream_events,
    streaming_dedup_counts,
    user_running_counts,
    windowed_counts,
)

__all__ = [
    "stream_events",
    "stream_documents",
    "streaming_dedup_counts",
    "windowed_counts",
    "click_purchase_interval_join",
    "segment_counts",
    "session_counts",
    "user_running_counts",
    "run_to_memory",
]
