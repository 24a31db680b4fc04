from emulating_hadoop_with_mpi_spark.streaming.events import (
    dedup_stream,
    events_source,
    events_stream,
    events_stream_auto,
    kafka_events_stream,
    normalize_event_stream,
    run_to_memory,
    running_user_totals,
    sessionized,
    split_events_for_replay,
    windowed_counts,
)

# streaming.dedup re-exports are LAZY (PEP 562): importing it eagerly would
# drag functions.dedup -> functions.text into any `import streaming.queries`,
# reshuffling the registry's registration order (registry.py front-loads
# q78/q90/q91 as driver-cap insurance).
_DEDUP_EXPORTS = {
    "IncrementalMinHash",
    "documents_stream",
    "run_incremental_dedup",
    "split_documents_for_replay",
}


def __getattr__(name: str):
    if name in _DEDUP_EXPORTS:
        from emulating_hadoop_with_mpi_spark.streaming import dedup as _dedup

        return getattr(_dedup, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "IncrementalMinHash",
    "dedup_stream",
    "documents_stream",
    "events_source",
    "events_stream",
    "events_stream_auto",
    "kafka_events_stream",
    "normalize_event_stream",
    "run_incremental_dedup",
    "run_to_memory",
    "running_user_totals",
    "sessionized",
    "split_documents_for_replay",
    "split_events_for_replay",
    "windowed_counts",
]
