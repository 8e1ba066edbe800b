from .av import (
    AUDIO_META_SCHEMA,
    VIDEO_META_SCHEMA,
    audio_features,
    sample_video_frames,
)

__all__ = [
    "AUDIO_META_SCHEMA",
    "VIDEO_META_SCHEMA",
    "audio_features",
    "sample_video_frames",
]
