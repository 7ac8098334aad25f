from .events import streaming_code_metadata, windowed_event_counts

__all__ = ["streaming_code_metadata", "windowed_event_counts"]
