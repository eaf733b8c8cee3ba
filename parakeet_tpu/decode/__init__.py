from parakeet_tpu.decode.timestamp import (
    FRAME_DURATION_S,
    TimestampedToken,
    WordTimestamp,
    TimestampMode,
    frame_to_seconds,
    group_timestamps,
)

__all__ = [
    "FRAME_DURATION_S",
    "TimestampedToken",
    "WordTimestamp",
    "TimestampMode",
    "frame_to_seconds",
    "group_timestamps",
]
