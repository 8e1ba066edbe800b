from .validate_stream import validate_stream, stream_status_events
from .windowed_stats import run_windowed_stats, windowed_event_stats

__all__ = [
    "validate_stream",
    "stream_status_events",
    "run_windowed_stats",
    "windowed_event_stats",
]
