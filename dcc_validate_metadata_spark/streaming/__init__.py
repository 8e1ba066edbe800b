from .validate_stream import validate_stream, stream_status_events
from .windowed_stats import (
    run_sessionized_stats,
    run_windowed_stats,
    sessionized_user_stats,
    windowed_event_stats,
)

__all__ = [
    "validate_stream",
    "stream_status_events",
    "run_windowed_stats",
    "run_sessionized_stats",
    "sessionized_user_stats",
    "windowed_event_stats",
]
