from vicinity_spark.streaming.clean import (
    predicted_lang_col,
    quality_pass_col,
    stream_clean,
)
from vicinity_spark.streaming.dedup import stream_exact_dedup
from vicinity_spark.streaming.ingest import (
    stream_events,
    stream_vector_ingest,
    windowed_event_counts,
)
from vicinity_spark.streaming.clean import stream_lm_scores
from vicinity_spark.streaming.neardup import (
    stateless_minhash,
    stream_daily_ingest,
    stream_neardup_candidates,
    stream_neardup_vs_snapshot,
)
from vicinity_spark.streaming.query import (
    stream_knn,
    stream_knn_foreachbatch,
    stream_semdedup_ingest,
    stream_threshold,
    unpersist_serving_cache,
)
from vicinity_spark.streaming.sessionize import sessionize_stream

__all__ = [
    "predicted_lang_col",
    "quality_pass_col",
    "sessionize_stream",
    "stateless_minhash",
    "stream_events",
    "stream_clean",
    "stream_daily_ingest",
    "stream_semdedup_ingest",
    "stream_exact_dedup",
    "stream_knn",
    "stream_knn_foreachbatch",
    "stream_lm_scores",
    "stream_neardup_candidates",
    "stream_neardup_vs_snapshot",
    "stream_threshold",
    "stream_vector_ingest",
    "unpersist_serving_cache",
    "windowed_event_counts",
]
