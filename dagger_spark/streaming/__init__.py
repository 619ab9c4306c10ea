from .drift import bucket_of, hdr_quantiles_stream, psi_drift_stream
from .ivm import (
    merge_rollup_partial, read_rollup_state, run_incremental_rollup_stream,
)
from .job import (
    build_alert_stream, configure_state_store, file_stream_events,
    run_to_memory,
)

__all__ = [
    "bucket_of", "build_alert_stream", "configure_state_store",
    "file_stream_events", "hdr_quantiles_stream", "merge_rollup_partial",
    "psi_drift_stream", "read_rollup_state", "run_incremental_rollup_stream",
    "run_to_memory",
]
