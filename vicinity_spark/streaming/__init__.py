from vicinity_spark.streaming.ingest import (
    stream_events,
    stream_vector_ingest,
    windowed_event_counts,
)
from vicinity_spark.streaming.sessionize import sessionize_stream

__all__ = [
    "sessionize_stream",
    "stream_events",
    "stream_vector_ingest",
    "windowed_event_counts",
]
