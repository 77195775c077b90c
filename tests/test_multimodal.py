"""Multimodal plumbing: schemas, mapInPandas batch contracts, stub
gating (NotImplementedError without fake=True)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from vicinity_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", bytes([1, 2, 3, 4]), 640, 480, None),
        (2, "image", bytes([5, 6, 7, 8, 9]), 800, 600, None),
        (3, "video", bytes([10, 11]), 1920, 1080, 3500),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_fake(media_df):
    res = extract_features(media_df, fake=True).collect()
    assert len(res) == 3
    for r in res:
        assert len(r.feature) == FEATURE_DIM
    by_id = {r.media_id: r for r in res}
    assert by_id[1].n_bytes == 4
    assert by_id[2].n_bytes == 5
    # deterministic: same payload → same feature
    res2 = extract_features(media_df, fake=True).collect()
    assert {r.media_id: r.feature for r in res2} == {r.media_id: r.feature for r in res}


def test_extract_features_stub_raises(media_df):
    with pytest.raises(PythonException, match="NotImplementedError"):
        extract_features(media_df, fake=False).collect()


def test_resize_images_fake(media_df):
    res = resize_images(media_df, 128, 128, fake=True).collect()
    assert all(r.meta_width == 128 and r.meta_height == 128 for r in res)


def test_sample_frames_fake(media_df):
    res = sample_frames(media_df, every_ms=1000, fake=True).collect()
    assert len(res) == 3  # 3500ms // 1000ms
    assert all(r.media_type == "image" for r in res)
