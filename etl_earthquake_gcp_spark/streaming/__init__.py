from .jobs import stream_dedup_within_watermark, stream_tumbling_counts

__all__ = ["stream_tumbling_counts", "stream_dedup_within_watermark"]
