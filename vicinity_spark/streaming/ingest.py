"""Structured Streaming operators (★ extension — the reference has no
streaming constructs at all, SURVEY.md §2.5; its closest analog is
online `insert` into a built index, vicinity/vicinity.py:236-253).

Three streaming shapes a vector/data pipeline needs:
- `stream_events`: file-source ingest of the events table shape.
- `windowed_event_counts`: watermarked tumbling-window aggregation
  (late data handled by the watermark, not by reprocessing).
- `stream_vector_ingest`: continuous corpus growth — new vector rows
  appended to a VectorStore layout via foreachBatch, applying the
  strategy's `on_insert` decoration (e.g. IVF cluster assignment) so
  the index layout stays query-ready without refits.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_events(
    spark: SparkSession, source_dir: str, schema: StructType, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream: each new file in source_dir is a micro-batch."""
    return spark.readStream.format(fmt).schema(schema).load(source_dir)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts — the streaming twin of the
    batch `events_hourly` query (vicinity_spark/queries.py)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def stream_vector_ingest(
    vectors_stream: DataFrame,
    store_path: str,
    strategy=None,
    metric=None,
    dim: Optional[int] = None,
    checkpoint: Optional[str] = None,
    on_batch: Optional[Callable[[DataFrame, int], None]] = None,
):
    """Append streaming vector rows into a VectorStore parquet layout.

    Each micro-batch is decorated by the strategy's `on_insert` (layout
    columns: LSH buckets / IVF cluster ids) and appended — the batch
    analog is VectorStore.insert (store.py). Returns the StreamingQuery.
    """

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if strategy is not None:
            out = strategy.on_insert(out, metric, dim)
        if on_batch is not None:
            on_batch(out, batch_id)
        else:
            out.write.mode("append").parquet(store_path)

    writer = vectors_stream.writeStream.foreachBatch(_handle).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()
