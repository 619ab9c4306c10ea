from .job import build_alert_stream, file_stream_events, run_to_memory

__all__ = ["build_alert_stream", "file_stream_events", "run_to_memory"]
