from vicinity_spark.streaming.ingest import (
    stream_events,
    stream_vector_ingest,
    windowed_event_counts,
)

__all__ = ["stream_events", "stream_vector_ingest", "windowed_event_counts"]
