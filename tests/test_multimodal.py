"""Multimodal plumbing: schemas, mapInPandas batch contracts, stub
gating (NotImplementedError without fake=True)."""

import numpy as np
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


# ---- real BMP codec path (fake=False, r3 VERDICT item 8) ------------


def _gradient_bmp(w, h):
    import numpy as np

    from vicinity_spark.operators.multimodal import _bmp_encode

    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(x * 255 // max(w - 1, 1)), (y * 255 // max(h - 1, 1)), ((x + y) % 256)],
        axis=-1,
    ).astype("uint8")
    return img, _bmp_encode(img)


def test_bmp_encode_decode_roundtrip():
    import numpy as np

    from vicinity_spark.operators.multimodal import _bmp_decode, _bmp_encode

    for w, h in ((5, 3), (16, 16), (7, 1)):  # odd widths exercise row padding
        img, payload = _gradient_bmp(w, h)
        assert payload[:2] == b"BM"
        back = _bmp_decode(payload)
        assert back.shape == (h, w, 3)
        assert np.array_equal(back, img)


def test_extract_features_real_bmp(spark):
    """fake=False genuinely executes on BMP payloads: features are the
    4x4 mean-pooled grayscale grid, verified against a local numpy
    computation of the same fixture."""
    import numpy as np

    from vicinity_spark.operators.multimodal import _bmp_features

    img, payload = _gradient_bmp(32, 24)
    df = spark.createDataFrame([(1, "image", payload, 32, 24, None)], MEDIA_SCHEMA)
    rows = extract_features(df, fake=False).collect()
    assert len(rows) == 1
    want = _bmp_features(img)
    assert np.allclose(rows[0].feature, want, atol=1e-6)
    assert rows[0].n_bytes == len(payload)


def test_resize_images_real_bmp(spark):
    """fake=False resize decodes, nearest-neighbor resamples, and
    re-encodes a valid BMP of the requested dimensions; the pooled-grid
    features stay close (resize-stable embedding)."""
    import numpy as np

    from vicinity_spark.operators.multimodal import _bmp_decode, _bmp_features

    img, payload = _gradient_bmp(64, 48)
    df = spark.createDataFrame([(1, "image", payload, 64, 48, None)], MEDIA_SCHEMA)
    rows = resize_images(df, width=16, height=12, fake=False).collect()
    assert len(rows) == 1
    assert (rows[0].meta_width, rows[0].meta_height) == (16, 12)
    small = _bmp_decode(bytes(rows[0].payload))
    assert small.shape == (12, 16, 3)
    assert np.allclose(_bmp_features(small), _bmp_features(img), atol=0.05)


def test_extract_features_non_bmp_still_gated(media_df):
    with pytest.raises(PythonException, match="NotImplementedError"):
        extract_features(media_df, fake=False).collect()


def test_bmp_roundtrip_property():
    """Property: any uint8 RGB image round-trips exactly through the
    BMP encoder/decoder, across widths that exercise every row-padding
    remainder (w*3 mod 4 in {0,1,2,3})."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vicinity_spark.operators.multimodal import _bmp_decode, _bmp_encode

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=13),
        h=st.integers(min_value=1, max_value=9),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, seed):
        img = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype("uint8")
        assert np.array_equal(_bmp_decode(_bmp_encode(img)), img)

    check()


def test_fake_mode_total_on_corrupt_bmp_sniff(spark):
    """fake=True must be TOTAL: payloads that sniff as BMP ('BM' magic,
    >=54 bytes) but fail to decode fall back to the stand-in (features)
    / passthrough (resize) instead of raising."""
    import numpy as np

    from vicinity_spark.operators.multimodal import _fake_decode

    corrupt = b"BM" + bytes(60)  # header declares 0x0 image — invalid
    _, good = _gradient_bmp(8, 8)
    truncated = good[: len(good) - 16]  # real BMP, missing pixel bytes
    rows = [
        (1, "image", corrupt, 0, 0, None),
        (2, "image", truncated, 8, 8, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r.media_id: r.feature for r in extract_features(df, fake=True).collect()}
    assert np.allclose(feats[1], _fake_decode(corrupt), atol=1e-6)
    assert np.allclose(feats[2], _fake_decode(truncated), atol=1e-6)

    resized = {r.media_id: bytes(r.payload) for r in resize_images(df, 4, 4, fake=True).collect()}
    assert resized[1] == corrupt  # passthrough, not an exception
    assert resized[2] == truncated


def test_fake_false_corrupt_bmp_raises_value_error(spark):
    """fake=False keeps the loud failure: a truncated BMP raises the
    codec's ValueError (not a silent fake fallback)."""
    _, good = _gradient_bmp(8, 8)
    df = spark.createDataFrame(
        [(1, "image", good[:-16], 8, 8, None)], MEDIA_SCHEMA
    )
    with pytest.raises(PythonException, match="ValueError"):
        extract_features(df, fake=False).collect()


def test_synthetic_bmp_media_features_are_exact_bit_patterns(spark):
    """The synthetic corpus's pooled features must be EXACTLY
    on_value·bit of (id % 65535) + 1 — the invariant the multimodal_knn
    oracle (queries.py) relies on to replicate the codec in SQL."""
    import numpy as np

    from vicinity_spark.operators.multimodal import (
        _bmp_decode,
        extract_features,
        synthetic_bmp_media,
    )
    from vicinity_spark.queries import _bmp_on_value

    ids = spark.range(0, 40, 7).select(F.col("id").alias("media_id"))
    media = synthetic_bmp_media(ids)
    on = _bmp_on_value()
    feats = {r.media_id: r.feature for r in extract_features(media, fake=False).collect()}
    assert len(feats) == 6
    for mid, f in feats.items():
        p = (mid % 65535) + 1
        expect = [on * ((p >> k) & 1) for k in range(16)]
        assert f == expect, (mid, f, expect)

    # payload really is a decodable BMP of the declared size
    one = media.where(F.col("media_id") == 7).collect()[0]
    img = _bmp_decode(bytes(one.payload))
    assert img.shape == (16, 16, 3)
    assert set(np.unique(img)) <= {0, 255}


def test_decode_meta_reports_decoded_not_declared_dims(spark):
    """decode_meta must report what the decoder SAW, even when the
    declared meta columns lie; fake=True falls back to declared meta
    for undecodable payloads."""
    from vicinity_spark.operators.multimodal import _bmp_encode, decode_meta

    import numpy as np

    real = _bmp_encode(np.zeros((6, 10, 3), np.uint8))  # 10 wide, 6 tall
    rows = [
        (1, "image", real, 999, 999, None),  # declared meta is wrong
        (2, "audio", bytes([1, 2, 3]), None, None, 1200),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in decode_meta(df, fake=True).collect()}
    assert (out[1].width, out[1].height) == (10, 6)
    assert out[1].n_bytes == len(real)
    assert out[2].width is None and out[2].height is None

    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_meta(df, fake=False).collect()


# ---- WAV/PCM audio codec (r5) ---------------------------------------


def test_wav_roundtrip_property():
    """encode→decode is lossless up to 16-bit quantization for
    arbitrary frame counts, channel counts, and rates."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vicinity_spark.operators.multimodal import _wav_decode, _wav_encode

    @settings(max_examples=25, deadline=None)
    @given(
        frames=st.integers(min_value=1, max_value=200),
        channels=st.integers(min_value=1, max_value=3),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(frames, channels, rate, seed):
        rng = np.random.default_rng(seed)
        x = (rng.random((frames, channels)).astype(np.float32) - 0.5) * 1.8
        y, r = _wav_decode(_wav_encode(x, rate))
        assert r == rate
        assert y.shape == (frames, channels)
        np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1.5 / 32768)

    check()


def test_wav_decode_all_sample_formats():
    """8-bit unsigned, 16/32-bit signed PCM, and IEEE float32 data
    chunks all decode; chunk walking skips ancillary chunks."""
    from vicinity_spark.operators.multimodal import _wav_decode

    def wav(fmt_code, bits, data, channels=1, rate=8000, extra_chunk=b""):
        block = channels * bits // 8
        fmt = (
            fmt_code.to_bytes(2, "little") + channels.to_bytes(2, "little")
            + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
            + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
        )
        body = b"WAVE" + extra_chunk + b"fmt " + (16).to_bytes(4, "little") + fmt
        body += b"data" + len(data).to_bytes(4, "little") + data
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    # 16-bit signed: full-scale positive
    x, r = _wav_decode(wav(1, 16, np.array([32767, -32768, 0], "<i2").tobytes()))
    np.testing.assert_allclose(x[:, 0], [32767 / 32768, -1.0, 0.0], atol=1e-6)
    # 8-bit unsigned
    x, _ = _wav_decode(wav(1, 8, bytes([255, 0, 128])))
    np.testing.assert_allclose(x[:, 0], [127 / 128, -1.0, 0.0], atol=1e-6)
    # 32-bit signed
    x, _ = _wav_decode(wav(1, 32, np.array([2**31 - 1, -(2**31)], "<i4").tobytes()))
    np.testing.assert_allclose(x[:, 0], [1.0, -1.0], atol=1e-6)
    # IEEE float32
    x, _ = _wav_decode(wav(3, 32, np.array([0.25, -0.75], "<f4").tobytes()))
    np.testing.assert_allclose(x[:, 0], [0.25, -0.75], atol=1e-7)
    # ancillary LIST chunk before fmt is skipped (odd size → padded)
    junk = b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"
    x, _ = _wav_decode(wav(1, 16, np.array([100], "<i2").tobytes(), extra_chunk=junk))
    assert x.shape == (1, 1)


def test_synthetic_wav_media_features_closed_form(spark):
    """REAL-codec feature extraction over the synthetic WAV corpus:
    windowed RMS ≈ 0.5·bit of (id % 255) + 1 and zero-crossing rate
    ≈ 0.5·bit — the audio analog of the BMP bit-pattern invariant."""
    from vicinity_spark.operators.multimodal import (
        extract_features,
        synthetic_wav_media,
    )

    ids = spark.range(0, 40).select(F.col("id").alias("media_id"))
    media = synthetic_wav_media(ids)
    rows = extract_features(media, fake=False).collect()
    assert len(rows) == 40
    for r in rows:
        p = (r.media_id % 255) + 1
        f = r.feature
        assert len(f) == 16
        for i in range(8):
            bit = (p >> i) & 1
            assert f[i] == pytest.approx(0.5 * bit, abs=5e-3), (r.media_id, i)
            if bit:
                assert 0.4 <= f[8 + i] <= 0.6, (r.media_id, i)
            else:
                assert f[8 + i] == 0.0


def test_extract_features_mixed_bmp_wav_corpus(spark):
    """One corpus, two real codecs: per-row sniffing dispatches BMP
    rows to the image kernel and WAV rows to the audio kernel with
    fake=False."""
    from vicinity_spark.operators.multimodal import (
        extract_features,
        synthetic_bmp_media,
        synthetic_wav_media,
    )

    ids = spark.range(0, 10)
    bmp = synthetic_bmp_media(ids.select(F.col("id").alias("media_id")))
    wav = synthetic_wav_media(ids.select((F.col("id") + 100).alias("media_id")))
    feats = extract_features(bmp.unionByName(wav), fake=False).collect()
    assert len(feats) == 20
    by_type = {}
    for r in feats:
        by_type.setdefault(r.media_type, []).append(r)
    assert len(by_type["image"]) == 10 and len(by_type["audio"]) == 10


def test_resample_audio_real_wav(spark):
    """Real resample: half the rate → half the frames, duration
    recomputed from the DECODED frame count, RMS feature half
    preserved (nearest-neighbor sampling of per-window constant
    amplitudes)."""
    from vicinity_spark.operators.multimodal import (
        _wav_decode,
        extract_features,
        resample_audio,
        synthetic_wav_media,
    )

    ids = spark.range(0, 8).select(F.col("id").alias("media_id"))
    media = synthetic_wav_media(ids, rate=8000)
    half = resample_audio(media, rate=4000)
    rows = half.collect()
    for r in rows:
        x, rate = _wav_decode(bytes(r.payload))
        assert rate == 4000
        assert x.shape[0] == 256  # 512 frames @8k → 256 @4k
        assert r.meta_duration_ms == 64  # 256/4000 s
    orig = {r.media_id: r.feature for r in extract_features(media, fake=False).collect()}
    res = {r.media_id: r.feature for r in extract_features(half, fake=False).collect()}
    for mid, f in res.items():
        np.testing.assert_allclose(f[:8], orig[mid][:8], atol=5e-3)


def test_fake_mode_total_on_corrupt_wav_sniff(spark):
    """A payload that sniffs as WAV but fails to decode falls back to
    the stand-in under fake=True (totality) and raises under
    fake=False — the same contract as the corrupt-BMP rule."""
    from vicinity_spark.operators.multimodal import extract_features

    corrupt = b"RIFF" + (100).to_bytes(4, "little") + b"WAVE" + b"\x00" * 40
    df = spark.createDataFrame(
        [(1, "audio", bytearray(corrupt), None, None, None)],
        "media_id long, media_type string, payload binary, "
        "meta_width int, meta_height int, meta_duration_ms int",
    )
    rows = extract_features(df, fake=True).collect()
    assert len(rows) == 1 and len(rows[0].feature) == 16
    with pytest.raises(PythonException, match="WAV|ValueError"):
        extract_features(df, fake=False).collect()


# ---- AVI video codec (r5) -------------------------------------------


def test_avi_roundtrip():
    """_avi_encode → _avi_decode_frames is lossless for uncompressed
    24-bit frames at several sizes (incl. non-multiple-of-4 widths
    exercising row-stride padding)."""
    from vicinity_spark.operators.multimodal import _avi_decode_frames, _avi_encode

    rng = np.random.default_rng(13)
    for w, h, n in [(16, 16, 3), (5, 7, 2), (1, 1, 1), (10, 3, 4)]:
        frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]
        got, usec = _avi_decode_frames(_avi_encode(frames, usec_per_frame=50_000))
        assert usec == 50_000 and len(got) == n
        for a, b in zip(frames, got):
            np.testing.assert_array_equal(a, b)


def test_sample_frames_real_avi(spark):
    """REAL frame sampling: AVI clips decode, sample by container
    timing, and re-encode as real BMPs whose features hit the real
    image path — video → frames → image features, end to end with
    fake=False everywhere."""
    from vicinity_spark.operators.multimodal import (
        extract_features,
        sample_frames,
        synthetic_avi_media,
    )

    ids = spark.range(0, 6).select(F.col("id").alias("media_id"))
    media = synthetic_avi_media(ids, n_frames=6, usec_per_frame=100_000)
    # every_ms=200 at 10 fps → every 2nd frame → 3 frames per clip
    frames = sample_frames(media, every_ms=200, fake=False)
    rows = frames.collect()
    assert len(rows) == 18
    assert all(r.media_type == "image" and bytes(r.payload)[:2] == b"BM" for r in rows)
    feats = extract_features(frames, fake=False).collect()
    on = None
    for r in feats:
        clip_id, f_idx = divmod(r.media_id, 100_000)
        p = ((clip_id + f_idx * 2) % 65535) + 1  # sampled every 2nd frame
        if on is None:
            nz = [x for x in r.feature if x > 0]
            on = nz[0]
        for k in range(16):
            want = on if (p >> k) & 1 else 0.0
            assert r.feature[k] == pytest.approx(want, abs=1e-6), (r.media_id, k)


def test_extract_features_clip_level_temporal_mean(spark):
    """Clip-level video features are the temporal mean of the
    per-frame grids — closed-form: mean over f of on·bit_k(pattern
    (id+f) % 65535 + 1)."""
    from vicinity_spark.operators.multimodal import (
        extract_features,
        synthetic_avi_media,
    )

    n_frames = 4
    ids = spark.range(0, 8).select(F.col("id").alias("media_id"))
    media = synthetic_avi_media(ids, n_frames=n_frames)
    rows = extract_features(media, fake=False).collect()
    assert len(rows) == 8
    nz = sorted({round(x, 6) for r in rows for x in r.feature if x > 0})
    on = None
    for r in rows:
        for k in range(16):
            bits = [
                ((((r.media_id + f) % 65535) + 1) >> k) & 1 for f in range(n_frames)
            ]
            frac = sum(bits) / n_frames
            if on is None and frac > 0:
                on = r.feature[k] / frac
            if on is not None:
                assert r.feature[k] == pytest.approx(on * frac, abs=1e-6), (r.media_id, k)


def test_fake_mode_total_on_corrupt_avi_sniff(spark):
    """Corrupt AVI-sniffing payloads: stand-in under fake=True, raise
    under fake=False — same contract as BMP/WAV."""
    from vicinity_spark.operators.multimodal import extract_features, sample_frames

    corrupt = b"RIFF" + (100).to_bytes(4, "little") + b"AVI " + b"\x00" * 60
    df = spark.createDataFrame(
        [(1, "video", bytearray(corrupt), None, None, 3000)],
        "media_id long, media_type string, payload binary, "
        "meta_width int, meta_height int, meta_duration_ms int",
    )
    rows = extract_features(df, fake=True).collect()
    assert len(rows) == 1 and len(rows[0].feature) == 16
    with pytest.raises(PythonException, match="AVI|ValueError"):
        extract_features(df, fake=False).collect()
    # sample_frames totality: fake=True falls back to declared-duration
    # passthrough rows; fake=False raises
    rows = sample_frames(df, every_ms=1000, fake=True).collect()
    assert len(rows) == 3
    with pytest.raises(PythonException, match="AVI|ValueError"):
        sample_frames(df, every_ms=1000, fake=False).collect()


# ---- PNG codec (r6) -------------------------------------------------

def test_png_roundtrip_property():
    """encode→decode is the identity for arbitrary RGB images."""
    import numpy as np

    from vicinity_spark.operators.multimodal import _png_decode, _png_encode

    rng = np.random.default_rng(17)
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = _png_decode(_png_encode(img))
        assert out.shape == (h, w, 3)
        assert (out == img).all(), (h, w)


def test_png_decode_all_filters_and_colortypes():
    """Hand-built PNGs exercising every scanline filter (0-4) and the
    greyscale/RGB/RGBA color types decode to the correct pixels."""
    import zlib

    import numpy as np

    from vicinity_spark.operators.multimodal import _PNG_SIG, _png_chunk, _png_decode

    def build(w, h, color, raw):
        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, color, 0, 0, 0])
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # 2x2 RGB, rows filtered Sub(1) then Up(2)
    img = np.array(
        [[[10, 20, 30], [40, 60, 80]], [[15, 25, 35], [50, 70, 90]]], np.uint8
    )
    row0 = img[0].reshape(-1).astype(np.int32)
    row1 = img[1].reshape(-1).astype(np.int32)
    sub0 = row0.copy()
    sub0[3:] = (row0[3:] - row0[:-3]) % 256
    up1 = (row1 - row0) % 256
    raw = b"\x01" + bytes(sub0.astype(np.uint8)) + b"\x02" + bytes(up1.astype(np.uint8))
    assert (_png_decode(build(2, 2, 2, raw)) == img).all()

    # 2x2 RGB via Average(3) then Paeth(4): encode by applying the
    # filter forward with the spec formulas, decoder must invert
    avg0 = row0.copy()
    for x in range(len(avg0)):
        a = row0[x - 3] if x >= 3 else 0
        avg0[x] = (row0[x] - (a >> 1)) % 256  # prev row = 0
    pae1 = row1.copy()
    for x in range(len(pae1)):
        a = row1[x - 3] if x >= 3 else 0
        c = row0[x - 3] if x >= 3 else 0
        b = row0[x]
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
        pae1[x] = (row1[x] - pred) % 256
    raw = b"\x03" + bytes(avg0.astype(np.uint8)) + b"\x04" + bytes(pae1.astype(np.uint8))
    assert (_png_decode(build(2, 2, 2, raw)) == img).all()

    # greyscale → replicated channels; RGBA → alpha dropped
    g = np.array([[7, 200]], np.uint8)
    raw = b"\x00" + bytes(g[0])
    out = _png_decode(build(2, 1, 0, raw))
    assert (out == np.repeat(g[:, :, None], 3, axis=2)).all()
    rgba = bytes([1, 2, 3, 255, 9, 8, 7, 0])
    out = _png_decode(build(2, 1, 6, b"\x00" + rgba))
    assert (out == np.array([[[1, 2, 3], [9, 8, 7]]], np.uint8)).all()


def test_png_rejects_unsupported_and_corrupt():
    import numpy as np
    import pytest as _pytest

    from vicinity_spark.operators.multimodal import _png_decode, _png_encode

    img = np.zeros((2, 2, 3), np.uint8)
    good = _png_encode(img)
    with _pytest.raises(ValueError, match="not a PNG"):
        _png_decode(b"whatever")
    # flip the IHDR interlace byte (offset: 8 sig + 8 len/type + 12)
    interlaced = bytearray(good)
    interlaced[8 + 8 + 12] = 1
    with _pytest.raises(ValueError, match="interlaced"):
        _png_decode(bytes(interlaced))
    # corrupt the DEFLATE stream
    bad = bytearray(good)
    bad[8 + 25 + 8 + 2] ^= 0xFF
    with _pytest.raises(ValueError):
        _png_decode(bytes(bad))
    # truncated pixel data: declare 4x4 but provide 2x2's stream
    import zlib

    from vicinity_spark.operators.multimodal import _PNG_SIG, _png_chunk

    ihdr = (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    short = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" + b"\x01" * 6))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="truncated"):
        _png_decode(short)


def test_png_media_pipeline_matches_bmp(spark):
    """synthetic_png_media → extract_features/decode_meta/resize runs
    the REAL PNG path (fake=False) and produces byte-for-byte the same
    features as the BMP encoding of the same pattern images."""
    from vicinity_spark.operators.multimodal import (
        extract_features,
        decode_meta,
        resize_images,
        synthetic_bmp_media,
        synthetic_png_media,
    )

    ids = spark.range(40).select(F.col("id").alias("media_id"))
    png = synthetic_png_media(ids)
    bmp = synthetic_bmp_media(ids)
    fp = {r.media_id: r.feature for r in extract_features(png, fake=False).collect()}
    fb = {r.media_id: r.feature for r in extract_features(bmp, fake=False).collect()}
    assert fp == fb and len(fp) == 40
    meta = decode_meta(png, fake=False).collect()
    assert all(r.width == 16 and r.height == 16 for r in meta)
    small = resize_images(png, 8, 8, fake=False)
    m2 = decode_meta(small, fake=False).collect()
    assert all(r.width == 8 and r.height == 8 for r in m2)


def test_png_decompression_bomb_rejected():
    """A KB-sized payload declaring huge dimensions must raise a
    ValueError (fake=True totality: bombs fall back, never OOM)."""
    import zlib

    import numpy as np
    import pytest as _pytest

    from vicinity_spark.operators.multimodal import _PNG_SIG, _png_chunk, _png_decode

    w = h = 30_000  # 2.7 GB declared pixel bytes from a ~3 MB payload
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    bomb = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (h * 16), 9))
        + _png_chunk(b"IEND", b"")
    )
    assert len(bomb) < 4 * 1024 * 1024
    with _pytest.raises(ValueError, match="cap"):
        _png_decode(bomb)

    # under the cap but with an over-long DEFLATE stream: decode stops
    # at the declared pixel bytes instead of materializing the rest
    img = np.zeros((2, 2, 3), np.uint8)
    from vicinity_spark.operators.multimodal import _png_encode

    ihdr2 = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    padded = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr2)
        + _png_chunk(b"IDAT", zlib.compress((b"\x00" + b"\x00" * 6) * 2 + b"\xff" * 10_000))
        + _png_chunk(b"IEND", b"")
    )
    assert (_png_decode(padded) == img).all()


# ---- JPEG (r7, fifth real codec) ------------------------------------


def test_jpeg_exact_roundtrip_on_block_constant_images():
    """quality=100 (all-ones quantization tables) round-trips
    blockwise-constant images EXACTLY: each solid 8×8 block has an
    integral DC (8·(v−128)) and zero AC — the property the
    multimodal_knn image_jpeg oracle branch leans on."""
    import numpy as np

    from vicinity_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode,
        _pattern_img,
    )

    for p in [1, 0x5A5A, 65535, 0xBEEF % 65535 + 1]:
        img = _pattern_img(p, 4, 8)  # 32x32, solid 8px cells
        assert np.array_equal(_jpeg_decode(_jpeg_encode(img, quality=100)), img), p


def test_jpeg_near_lossless_roundtrip_arbitrary_images():
    """quality=100 on arbitrary (worst-case noise) images: error is
    bounded by DCT-coefficient rounding only (±a few intensity levels),
    across non-multiple-of-8 shapes."""
    import numpy as np

    from vicinity_spark.operators.multimodal import _jpeg_decode, _jpeg_encode

    rng = np.random.default_rng(19)
    for h, w in [(8, 8), (23, 37), (16, 41), (9, 8)]:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        out = _jpeg_decode(_jpeg_encode(img, quality=100))
        assert out.shape == (h, w, 3)
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= 4, (h, w, err)


def test_jpeg_subsampled_and_restart_variants_decode():
    """4:2:0 subsampling and restart-interval streams decode; 4:2:0 is
    exact on grayscale block-constant images (chroma is neutral), and a
    restarted stream decodes identically to the unrestarted one."""
    import numpy as np

    from vicinity_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode,
        _pattern_img,
    )

    img = _pattern_img(4321, 4, 8)
    sub = _jpeg_decode(_jpeg_encode(img, quality=100, subsample=True))
    assert np.array_equal(sub, img)
    rng = np.random.default_rng(23)
    noisy = rng.integers(0, 256, (24, 16, 3), np.uint8)
    with_rst = _jpeg_decode(_jpeg_encode(noisy, quality=85, restart_interval=2))
    without = _jpeg_decode(_jpeg_encode(noisy, quality=85))
    assert np.array_equal(with_rst, without)


def test_jpeg_rejects_unsupported_and_corrupt():
    import numpy as np
    import pytest as _pytest

    from vicinity_spark.operators.multimodal import _jpeg_decode, _jpeg_encode

    img = np.zeros((8, 8, 3), np.uint8)
    good = bytearray(_jpeg_encode(img, quality=90))
    with _pytest.raises(ValueError, match="not a JPEG"):
        _jpeg_decode(b"nope")
    # flip SOF0 marker to SOF2 (progressive) — must raise honestly
    sof = good.find(b"\xff\xc0")
    prog = good.copy()
    prog[sof + 1] = 0xC2
    with _pytest.raises(ValueError, match="baseline"):
        _jpeg_decode(bytes(prog))
    # truncate mid-scan
    with _pytest.raises(ValueError):
        _jpeg_decode(bytes(good[:40]))
    # dimension bomb: patch SOF dims to 40000x40000
    bomb = good.copy()
    bomb[sof + 5 : sof + 7] = (40000).to_bytes(2, "big")
    bomb[sof + 7 : sof + 9] = (40000).to_bytes(2, "big")
    with _pytest.raises(ValueError, match="cap"):
        _jpeg_decode(bytes(bomb))


def test_jpeg_media_pipeline_matches_bmp(spark):
    """synthetic_jpeg_media → extract_features/decode_meta/resize runs
    the REAL JPEG path (fake=False); at cell_px=8 / quality=100 the
    features are byte-for-byte those of the BMP encoding of the same
    patterns (scaled 2× — feature pooling is resolution-invariant on
    solid cells)."""
    from vicinity_spark.operators.multimodal import (
        decode_meta,
        extract_features,
        resize_images,
        synthetic_bmp_media,
        synthetic_jpeg_media,
    )

    ids = spark.range(40).select(F.col("id").alias("media_id"))
    jpg = synthetic_jpeg_media(ids)  # 32x32, 8px cells
    bmp = synthetic_bmp_media(ids, cell_px=8)  # same resolution
    fj = {r.media_id: r.feature for r in extract_features(jpg, fake=False).collect()}
    fb = {r.media_id: r.feature for r in extract_features(bmp, fake=False).collect()}
    assert fj == fb and len(fj) == 40
    meta = decode_meta(jpg, fake=False).collect()
    assert all(r.width == 32 and r.height == 32 for r in meta)
    small = resize_images(jpg, 16, 16, fake=False)
    m2 = decode_meta(small, fake=False).collect()
    assert all(r.width == 16 and r.height == 16 for r in m2)


def test_fake_mode_total_on_corrupt_jpeg_sniff(spark):
    """Bytes that merely sniff as JPEG fall back to the stand-in under
    fake=True and raise under fake=False — the same totality rule as
    every other codec."""
    import pytest as _pytest

    from vicinity_spark.operators.multimodal import extract_features

    rows = [(0, "image", bytearray(b"\xff\xd8\xff\xe0garbagegarbage"), None, None, None)]
    from vicinity_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = extract_features(df, fake=True).collect()
    assert len(got) == 1 and len(got[0].feature) == 16
    with _pytest.raises(Exception):
        extract_features(df, fake=False).collect()


def test_jpeg_fill_bytes_before_markers_decode():
    """ADVICE r7 / T.81 B.1.1.2: markers may be preceded by any number
    of 0xFF fill bytes. External encoders pad with them; the parser
    (full decode AND the header-only _jpeg_meta slice) must skip fill
    bytes instead of reading 0xFF as a marker code + bogus length."""
    import numpy as np

    from vicinity_spark.operators.multimodal import (
        _jpeg_decode,
        _jpeg_encode,
        _jpeg_meta,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    clean = _jpeg_encode(img, quality=100)
    # inject fill bytes before every segment marker after SOI (markers
    # outside entropy-coded data; entropy data itself is untouched —
    # 0xFF bytes there are byte-stuffed 0xFF00 already)
    padded = bytearray()
    pos = 0
    n = len(clean)
    padded += clean[:2]
    pos = 2
    while pos + 4 <= n:
        assert clean[pos] == 0xFF
        marker = clean[pos + 1]
        padded += b"\xff\xff\xff"  # three fill bytes, then the marker
        if marker == 0xDA:  # SOS: copy the rest verbatim
            padded += clean[pos:]
            break
        seglen = int.from_bytes(clean[pos + 2 : pos + 4], "big")
        padded += clean[pos : pos + 2 + seglen]
        pos += 2 + seglen
    padded = bytes(padded)
    assert len(padded) > len(clean)
    assert _jpeg_meta(padded) == _jpeg_meta(clean) == (9, 13)
    assert np.array_equal(_jpeg_decode(padded), _jpeg_decode(clean))
