from .events import streaming_code_metadata, windowed_event_counts
from .sessions import sessionize

__all__ = ["streaming_code_metadata", "windowed_event_counts", "sessionize"]
