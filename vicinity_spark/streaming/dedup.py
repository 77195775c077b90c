"""Streaming deduplication (★ extension — the reference has no
streaming surface; SURVEY.md §2.5).

The streaming twin of operators/dedup.py exact_dedup: a document
stream is deduplicated on a content key as it arrives, so a training
corpus ingested continuously never accumulates exact copies.

State posture at scale: `dropDuplicatesWithinWatermark` keeps one
state row per distinct key only until the watermark passes its event
time, so state is bounded by the distinct-key arrival rate × watermark
horizon — not by the full corpus history (plain dropDuplicates on an
unbounded stream grows state forever; that mode is still exposed for
finite backfills where exactness across the whole replay matters).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_COL = "__dedup_key"


def content_key(text_col: str = "text"):
    """Portable md5 content key (same family as operators/dedup.py)."""
    return F.md5(F.col(text_col).cast("binary"))


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-seen-wins exact dedup of a streaming document source.

    With `ts_col`, state is watermark-bounded
    (dropDuplicatesWithinWatermark): a duplicate arriving within the
    watermark horizon of its first copy is dropped, later ones are the
    re-ingest case a pipeline handles with batch dedup downstream.
    Without `ts_col`, exact global dedup with unbounded state — for
    finite replays/backfills only.
    """
    keyed = docs.withColumn(KEY_COL, content_key(text_col))
    if ts_col is not None:
        out = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [KEY_COL]
        )
    else:
        out = keyed.dropDuplicates([KEY_COL])
    return out.drop(KEY_COL)
