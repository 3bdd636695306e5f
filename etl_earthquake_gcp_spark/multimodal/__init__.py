from .media import (
    DECODED_SCHEMA,
    FRAME_SCHEMA,
    attach_media,
    decode_media,
    frame_sample,
)

__all__ = [
    "DECODED_SCHEMA",
    "FRAME_SCHEMA",
    "attach_media",
    "decode_media",
    "frame_sample",
]
