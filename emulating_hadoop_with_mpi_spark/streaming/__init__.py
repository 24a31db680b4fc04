from emulating_hadoop_with_mpi_spark.streaming.events import (
    dedup_stream,
    events_stream,
    run_to_memory,
    running_user_totals,
    sessionized,
    split_events_for_replay,
    windowed_counts,
)

__all__ = [
    "dedup_stream",
    "events_stream",
    "run_to_memory",
    "running_user_totals",
    "sessionized",
    "split_events_for_replay",
    "windowed_counts",
]
