from python_ctd_spark.streaming.pipeline import (
    dedup_stream,
    despike_closeout,
    event_stream,
    run_to_memory,
    run_to_parquet,
    session_windows,
    state_partitions,
    stream_stream_join,
    stateful_despike,
    stateful_press_check,
    streaming_bindata,
    windowed_stats,
)

__all__ = [
    "dedup_stream",
    "despike_closeout",
    "event_stream",
    "run_to_memory",
    "run_to_parquet",
    "session_windows",
    "state_partitions",
    "stream_stream_join",
    "stateful_despike",
    "stateful_press_check",
    "streaming_bindata",
    "windowed_stats",
]
