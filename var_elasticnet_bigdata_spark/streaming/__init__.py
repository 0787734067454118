from .events import (
    stream_events,
    windowed_event_counts,
    run_stream_to_memory,
    stateful_user_totals,
)

__all__ = [
    "stream_events",
    "windowed_event_counts",
    "run_stream_to_memory",
    "stateful_user_totals",
]
