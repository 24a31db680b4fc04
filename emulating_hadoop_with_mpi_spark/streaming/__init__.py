from emulating_hadoop_with_mpi_spark.streaming.dedup import (
    IncrementalMinHash,
    documents_stream,
    run_incremental_dedup,
    split_documents_for_replay,
)
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
    "IncrementalMinHash",
    "dedup_stream",
    "documents_stream",
    "events_stream",
    "run_incremental_dedup",
    "run_to_memory",
    "running_user_totals",
    "sessionized",
    "split_documents_for_replay",
    "split_events_for_replay",
    "windowed_counts",
]
