from .job import (
    build_alert_stream, configure_state_store, file_stream_events,
    run_to_memory,
)

__all__ = [
    "build_alert_stream", "configure_state_store", "file_stream_events",
    "run_to_memory",
]
