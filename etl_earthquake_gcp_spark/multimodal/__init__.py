from .media import (
    DECODED_SCHEMA,
    FRAME_SCHEMA,
    PPM_DECODED_SCHEMA,
    attach_media,
    attach_ppm,
    decode_media,
    decode_ppm,
    decode_ppm_media,
    frame_sample,
)

__all__ = [
    "DECODED_SCHEMA",
    "FRAME_SCHEMA",
    "PPM_DECODED_SCHEMA",
    "attach_media",
    "attach_ppm",
    "decode_media",
    "decode_ppm",
    "decode_ppm_media",
    "frame_sample",
]
