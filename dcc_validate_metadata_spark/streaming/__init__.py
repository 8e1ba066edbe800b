from .validate_stream import validate_stream, stream_status_events

__all__ = ["validate_stream", "stream_status_events"]
