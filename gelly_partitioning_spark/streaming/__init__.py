from .stream_ops import (
    incremental_degrees,
    sessionize,
    sessionize_stream,
    stream_edges_from_directory,
    windowed_event_counts,
)

__all__ = [
    "incremental_degrees",
    "sessionize",
    "sessionize_stream",
    "stream_edges_from_directory",
    "windowed_event_counts",
]
