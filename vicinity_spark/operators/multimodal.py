"""Multimodal column operators (★ extension): image/audio/video as
opaque `binary` columns with typed metadata, processed by Arrow-batched
`mapInPandas` kernels.

The Spark-side plumbing — schemas, batch iteration, partition-sized
work units, output contracts — is real and tested. FOUR codecs are
real: uncompressed 24-bit BMP (`_bmp_decode`/`_bmp_encode`, r4), PNG
via stdlib zlib + numpy unfiltering (`_png_decode`/`_png_encode`,
r6), RIFF/WAVE PCM audio (`_wav_decode`/`_wav_encode`, r5 — 8/16/32-
bit integer + float32 samples), and RIFF/AVI uncompressed-DIB video
(`_avi_decode_frames`/`_avi_encode`, r5) — so
`extract_features(fake=False)`, `resize_images(fake=False)`,
`resample_audio(fake=False)` and `sample_frames(fake=False)`
genuinely execute on those payloads in this container. Every other
format still needs PIL/ffmpeg and raises NotImplementedError unless
`fake=True`, in which case a deterministic synthetic decode (seeded by
the content hash) stands in so downstream operators and tests have
stable inputs.

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


# ---- real codec: uncompressed 24-bit BMP (pure numpy) ---------------
# BMP is the one mainstream raster format decodable without a codec
# library: fixed 14-byte file header + 40-byte BITMAPINFOHEADER, then
# bottom-up BGR rows padded to 4 bytes. Enough to make the fake=False
# path genuinely executable end-to-end in this container.


def _is_bmp(payload: bytes) -> bool:
    return len(payload) >= 54 and payload[:2] == b"BM"


def _bmp_decode(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (H, W, 3) uint8 RGB, top-down."""
    if not _is_bmp(payload):
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    hdr_sz = int.from_bytes(payload[14:18], "little")
    if hdr_sz < 40:
        raise ValueError(f"unsupported BMP header size {hdr_sz}")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={comp})")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    if off + h * stride > len(payload):
        raise ValueError(
            f"truncated BMP: header declares {h * stride} pixel bytes at "
            f"offset {off} but payload is {len(payload)} bytes"
        )
    rows = np.frombuffer(payload, np.uint8, count=h * stride, offset=off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if flip else img).copy()


def _bmp_encode(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit bottom-up BMP bytes."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, bottom-up
    data = rows.tobytes()
    off, size = 54, 54 + len(data)
    hdr = b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00" + off.to_bytes(4, "little")
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 DPI
        + (0).to_bytes(4, "little") * 2
    )
    return hdr + info + data


def _bmp_features(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 → FEATURE_DIM floats: a 4×4 mean-pooled
    grayscale grid in [0, 1] — the classic tiny-thumbnail embedding
    (position-sensitive, resize-stable)."""
    gray = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
    h, w = gray.shape
    g = 4
    ys = np.linspace(0, h, g + 1).astype(int)
    xs = np.linspace(0, w, g + 1).astype(int)
    out = np.empty(g * g, np.float32)
    for i in range(g):
        for j in range(g):
            cell = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i * g + j] = cell.mean() / 255.0
    return out


def _bmp_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width)."""
    h, w = img.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return img[yi][:, xi]


# ---- real codec: PNG (stdlib zlib + numpy) --------------------------
# PNG joins BMP as a real image codec (r6): DEFLATE is in the Python
# standard library, and scanline unfiltering is plain numpy — no
# codec dependency. Coverage: 8-bit greyscale/RGB/RGBA,
# non-interlaced (the overwhelmingly common web/PIL default output);
# 16-bit, palette, and interlaced files raise honestly.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# decode ceiling: 256 MB of raw pixel bytes (~9k×9k RGB) — larger
# declarations raise rather than risk a decompression-bomb OOM
_PNG_MAX_PIXEL_BYTES = 256 * 1024 * 1024


def _is_png(payload: bytes) -> bool:
    return len(payload) >= 8 and payload[:8] == _PNG_SIG


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (0-4) → (h, stride) uint8.

    Filters None/Up are vectorized (the only filters our encoder
    emits); Sub/Average/Paeth carry per-pixel dependencies and run as
    per-byte loops — correct for any compliant file, just slower."""
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        cur = np.frombuffer(raw, np.uint8, count=stride, offset=pos).astype(np.int32)
        pos += stride
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if ft == 0:
            pass
        elif ft == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ft == 1:  # Sub
            cur = cur.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ft == 3:  # Average
            cur = cur.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = cur.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                b = prev[x]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                cur[x] = (cur[x] + (a if pa <= pb and pa <= pc else b if pb <= pc else c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur
    return out.astype(np.uint8)


def _png_decode(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit greyscale/RGB/RGBA PNG → (H, W, 3) uint8
    RGB (alpha dropped, grey replicated)."""
    import zlib

    if not _is_png(payload):
        raise ValueError("not a PNG payload")
    pos, n = 8, len(payload)
    ihdr = None
    idat = []
    while pos + 8 <= n:
        length = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # skip CRC
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
    if comp != 0 or filt != 0:
        raise ValueError("non-standard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if channels is None or depth != 8:
        raise ValueError(
            f"only 8-bit greyscale/RGB/RGBA PNG supported (depth={depth}, color={color})"
        )
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    stride = w * channels
    expected = h * (stride + 1)
    # decompression-bomb guard: a KB-sized payload can declare huge
    # dimensions and DEFLATE ~1000:1 — reject oversized declarations
    # as a ValueError (honest bound, and fake=True totality holds: a
    # bomb falls back instead of OOM-killing the executor), and never
    # decompress past the declared pixel bytes
    if expected > _PNG_MAX_PIXEL_BYTES:
        raise ValueError(
            f"PNG declares {expected} pixel bytes (> {_PNG_MAX_PIXEL_BYTES} cap)"
        )
    try:
        raw = zlib.decompressobj().decompress(b"".join(idat), expected)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG DEFLATE stream: {e}") from None
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if color == 0:
        return np.repeat(px, 3, axis=2).copy()
    return px[:, :, :3].copy()


def _png_encode(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → non-interlaced 8-bit truecolor PNG
    (filter 0 scanlines)."""
    import zlib

    h, w = img.shape[:2]
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# ---- real codec: RIFF/WAVE PCM (pure numpy) -------------------------
# WAV is the audio analog of BMP: a chunked container whose standard
# payloads (PCM integer / IEEE-float samples) need no codec library.
# Decoding it makes the AUDIO arm of the multimodal column genuinely
# executable in this container, the same upgrade r4 gave images.


def _is_wav(payload: bytes) -> bool:
    return len(payload) >= 44 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def _wav_decode(payload: bytes) -> "tuple[np.ndarray, int]":
    """RIFF/WAVE → ((n_samples, n_channels) float32 in [-1, 1], rate).

    Walks the chunk list properly (chunks are even-aligned; fmt may
    precede or follow ancillary chunks). Supports PCM 8-bit unsigned,
    16/32-bit signed, and IEEE float32."""
    if not _is_wav(payload):
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + sz]
        if len(body) < sz:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("short fmt chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if channels < 1 or rate <= 0:
        raise ValueError(f"invalid WAV fmt (channels={channels}, rate={rate})")
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV encoding (format={audio_fmt}, bits={bits})")
    frames = len(x) // channels
    if frames == 0:
        raise ValueError("empty WAV data chunk")
    return x[: frames * channels].reshape(frames, channels), rate


def _wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """(n_samples, n_channels) float in [-1, 1] → 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).round().astype("<i2").tobytes()
    block = channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + int(rate).to_bytes(4, "little")
        + (int(rate) * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + (16).to_bytes(4, "little") + fmt
    body += b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + len(body).to_bytes(4, "little") + body


# ---- real codec: RIFF/AVI with uncompressed DIB frames --------------
# AVI completes the modality triple: a chunked RIFF container whose
# '00db' (uncompressed device-independent bitmap) frames are raw
# bottom-up BGR rows — the same pixel layout BMP uses, so the decoder
# shares the BMP row logic and sampled frames re-encode as real BMPs.


def _is_avi(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def _avi_decode_frames(payload: bytes) -> "tuple[list[np.ndarray], int]":
    """RIFF/AVI → ([(H, W, 3) uint8 RGB per frame], usec_per_frame).

    Supports the standard uncompressed layout: LIST hdrl (avih for
    dims + frame timing, strl ignored), LIST movi with '00db' raw DIB
    chunks (24bpp bottom-up BGR, 4-byte row stride)."""
    if not _is_avi(payload):
        raise ValueError("not an AVI payload")

    def walk(buf, pos, end, out):
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            if pos + 8 + sz > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(buf, pos + 12, pos + 8 + sz, out)
            else:
                out.append((cid, pos + 8, sz))
            pos += 8 + sz + (sz & 1)

    chunks: "list[tuple[bytes, int, int]]" = []
    walk(payload, 12, len(payload), chunks)
    avih = next((payload[o : o + s] for c, o, s in chunks if c == b"avih"), None)
    if avih is None or len(avih) < 40:
        raise ValueError("AVI missing avih header")
    usec = int.from_bytes(avih[0:4], "little")
    w = int.from_bytes(avih[32:36], "little")
    h = int.from_bytes(avih[36:40], "little")
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid AVI dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    frames = []
    for cid, off, sz in chunks:
        if cid != b"00db":
            continue
        if sz < h * stride:
            raise ValueError("truncated AVI frame")
        rows = np.frombuffer(payload, np.uint8, count=h * stride, offset=off).reshape(
            h, stride
        )
        frames.append(rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy())
    if not frames:
        raise ValueError("AVI contains no uncompressed '00db' frames")
    return frames, usec


def _avi_encode(frames: "list[np.ndarray]", usec_per_frame: int = 100_000) -> bytes:
    """[(H, W, 3) uint8 RGB] → RIFF/AVI with uncompressed 24-bit DIB
    frames (standard avih/strh/strf headers + movi '00db' chunks)."""
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3

    def chunk(cid, body):
        return cid + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    frame_bytes = h * stride
    avih = (
        int(usec_per_frame).to_bytes(4, "little")
        + (frame_bytes * 1_000_000 // max(usec_per_frame, 1)).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (0x10).to_bytes(4, "little")  # AVIF_HASINDEX off; flags minimal
        + len(frames).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (1).to_bytes(4, "little")  # one stream
        + frame_bytes.to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + bytes(16)
    )
    strh = (
        b"vids" + b"DIB " + bytes(12)
        + int(usec_per_frame).to_bytes(4, "little")   # scale
        + (1_000_000).to_bytes(4, "little")           # rate → fps = rate/scale
        + (0).to_bytes(4, "little")
        + len(frames).to_bytes(4, "little")
        + frame_bytes.to_bytes(4, "little")
        + (0xFFFFFFFF).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + bytes(8)
    )
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + frame_bytes.to_bytes(4, "little")
        + bytes(16)
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    for img in frames:
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
        movi_body += chunk(b"00db", rows.tobytes())
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


_WAV_WINDOWS = FEATURE_DIM // 2


def _wav_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """(frames, channels) float32 → FEATURE_DIM floats: the audio twin
    of the BMP pooled grid — 8 windowed RMS energies + 8 windowed
    zero-crossing rates over the mono mix, all in [0, 1]. Pure exact
    arithmetic (no FFT), position-sensitive; the RMS half is
    resample-stable (ZCR scales with the sample rate by nature)."""
    mono = samples.mean(axis=1)
    n = len(mono)
    edges = np.linspace(0, n, _WAV_WINDOWS + 1).astype(int)
    out = np.empty(FEATURE_DIM, np.float32)
    for i in range(_WAV_WINDOWS):
        w = mono[edges[i] : max(edges[i + 1], edges[i] + 1)]
        out[i] = float(np.sqrt(np.mean(w * w)))
        out[_WAV_WINDOWS + i] = (
            float(np.mean(np.signbit(w[1:]) != np.signbit(w[:-1]))) if len(w) > 1 else 0.0
        )
    return out


def _wav_resample(samples: np.ndarray, rate: int, new_rate: int) -> np.ndarray:
    """Nearest-neighbor resample to new_rate (the audio analog of
    _bmp_resize — exact, library-free; production would band-limit)."""
    frames = samples.shape[0]
    out_frames = max(int(round(frames * new_rate / rate)), 1)
    idx = (np.arange(out_frames) * frames // out_frames).clip(0, frames - 1)
    return samples[idx]


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
            feats = []
            for p in pdf["payload"]:
                b = bytes(p)
                if _is_bmp(b):
                    # fake=True must stay total: a payload that merely
                    # sniffs as BMP/WAV (arbitrary bytes with the right
                    # magic, or a truncated real file) falls back to
                    # the stand-in instead of raising.
                    try:
                        feats.append(_bmp_features(_bmp_decode(b)))
                        continue
                    except ValueError:
                        if not fake:
                            raise
                elif _is_png(b):
                    # same grid embedding as BMP: image features are
                    # codec-independent once decoded to RGB
                    try:
                        feats.append(_bmp_features(_png_decode(b)))
                        continue
                    except ValueError:
                        if not fake:
                            raise
                elif _is_wav(b):
                    try:
                        feats.append(_wav_features(*_wav_decode(b)))
                        continue
                    except ValueError:
                        if not fake:
                            raise
                elif _is_avi(b):
                    # video feature = temporal mean pooling of the
                    # per-frame image features (standard clip-level
                    # descriptor); frame decode is the real DIB path
                    try:
                        frames, _ = _avi_decode_frames(b)
                        # float64 accumulation: the mean is then the
                        # IEEE double mean of the float32 frame grids,
                        # reproducible closed-form by an external
                        # oracle (float32 accumulation order wouldn't
                        # be)
                        feats.append(
                            np.mean(
                                np.stack([_bmp_features(f) for f in frames]).astype(
                                    np.float64
                                ),
                                axis=0,
                            ).astype(np.float32)
                        )
                        continue
                    except ValueError:
                        if not fake:
                            raise
                if fake:
                    feats.append(_fake_decode(b))
                else:
                    raise NotImplementedError(
                        "non-BMP/PNG/WAV/AVI media decode requires a codec library; "
                        "run with fake=True for the deterministic stand-in"
                    )
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
    """Image resize: real nearest-neighbor resample + re-encode for BMP
    payloads; passthrough (fake) or NotImplementedError for formats that
    need PIL. Same mapInPandas shape either way."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            payloads = []
            for p in out["payload"]:
                b = bytes(p)
                if _is_bmp(b):
                    # Same totality rule as extract_features: fake=True
                    # passes through payloads that sniff as BMP but fail
                    # to decode (corrupt/truncated) rather than raising.
                    try:
                        payloads.append(_bmp_encode(_bmp_resize(_bmp_decode(b), width, height)))
                        continue
                    except ValueError:
                        if not fake:
                            raise
                elif _is_png(b):
                    # decode → shared nearest-neighbor resample →
                    # re-encode with the real PNG encoder
                    try:
                        payloads.append(_png_encode(_bmp_resize(_png_decode(b), width, height)))
                        continue
                    except ValueError:
                        if not fake:
                            raise
                if fake:
                    payloads.append(b)
                else:
                    raise NotImplementedError(
                        "non-BMP/PNG image resize requires PIL; use fake=True"
                    )
            out["payload"] = payloads
            out["meta_width"] = width
            out["meta_height"] = height
            yield out

    return media.mapInPandas(kernel, media.schema)


def resample_audio(media: DataFrame, rate: int, fake: bool = False) -> DataFrame:
    """Audio resample — the audio twin of resize_images: real
    decode → nearest-neighbor resample → 16-bit PCM re-encode for WAV
    payloads; passthrough (fake) or NotImplementedError for formats
    that need ffmpeg. meta_duration_ms is recomputed from the DECODED
    frame count, not trusted from the input."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            payloads, durations = [], []
            for p, dur in zip(out["payload"], out["meta_duration_ms"]):
                b = bytes(p)
                if _is_wav(b):
                    # same totality rule as resize_images: fake=True
                    # passes through payloads that sniff as WAV but
                    # fail to decode rather than raising
                    try:
                        x, r = _wav_decode(b)
                        y = _wav_resample(x, r, rate)
                        payloads.append(_wav_encode(y, rate))
                        durations.append(int(len(y) * 1000 / rate))
                        continue
                    except ValueError:
                        if not fake:
                            raise
                if fake:
                    payloads.append(b)
                    durations.append(None if pd.isna(dur) else int(dur))
                else:
                    raise NotImplementedError(
                        "non-WAV audio resample requires ffmpeg; use fake=True"
                    )
            out["payload"] = payloads
            out["meta_duration_ms"] = pd.array(durations, dtype="Int32")
            yield out

    return media.mapInPandas(kernel, media.schema)


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Video frame sampling: REAL for RIFF/AVI payloads with
    uncompressed DIB frames — decode, take every `every_ms`-th frame
    by the container's frame timing, and re-encode each sampled frame
    as a real BMP (media_type='image'), so the sampled rows feed the
    real image feature path directly. Non-AVI payloads emit one
    passthrough row per `every_ms` of declared duration under
    fake=True (the codec-free stand-in) or raise. Output reuses
    MEDIA_SCHEMA."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for r in pdf.itertuples():
                b = bytes(r.payload)
                if _is_avi(b):
                    # same totality rule as the other codecs: under
                    # fake=True a payload that sniffs as AVI but fails
                    # to decode falls through to the stand-in
                    try:
                        frames, usec = _avi_decode_frames(b)
                        step = max(int(round(every_ms * 1000 / max(usec, 1))), 1)
                        for i, img in enumerate(frames[::step]):
                            rows.append(
                                {
                                    "media_id": r.media_id * 100_000 + i,
                                    "media_type": "image",
                                    "payload": _bmp_encode(img),
                                    "meta_width": int(img.shape[1]),
                                    "meta_height": int(img.shape[0]),
                                    "meta_duration_ms": 0,
                                }
                            )
                        continue
                    except ValueError:
                        if not fake:
                            raise
                if not fake:
                    raise NotImplementedError(
                        "non-AVI frame sampling requires ffmpeg; use fake=True"
                    )
                n = max(int((r.meta_duration_ms or 0) // every_ms), 0)
                for i in range(n):
                    rows.append(
                        {
                            "media_id": r.media_id * 100_000 + i,
                            "media_type": "image",
                            "payload": b,
                            "meta_width": r.meta_width,
                            "meta_height": r.meta_height,
                            "meta_duration_ms": 0,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.where(F.col("media_type") == "video").mapInPandas(kernel, MEDIA_SCHEMA)


def _pattern_img(p: int, grid: int, cell_px: int) -> np.ndarray:
    """The shared closed-form test-pattern image: pooled cell (i, j)
    solid white iff bit i·grid+j of `p` is set — used by the BMP, PNG,
    and AVI synthetic generators so all three oracles share ONE
    pattern encoding."""
    side = grid * cell_px
    img = np.zeros((side, side, 3), np.uint8)
    for i in range(grid):
        for j in range(grid):
            if (p >> (i * grid + j)) & 1:
                img[i * cell_px : (i + 1) * cell_px, j * cell_px : (j + 1) * cell_px, :] = 255
    return img


def synthetic_bmp_media(ids: DataFrame, id_col: str = "media_id", grid: int = 4, cell_px: int = 4) -> DataFrame:
    """Deterministic 24-bit BMP corpus: one (grid·cell_px)² RGB image
    per id, generated executor-side with the REAL encoder (`_bmp_encode`).

    Each id maps to the grid²-bit pattern `(id % 65535) + 1` (the +1
    keeps every image non-blank, so downstream cosine features are
    never the zero vector); pooled cell (i, j) is solid white iff bit
    i·grid+j is set, else black. Because every pixel inside a pooled
    cell is identical, `_bmp_features` of the encoded image is exactly
    `on_value·bit` per component — closed-form checkable by an external
    oracle without running a codec (see queries.py multimodal_knn)."""
    return _synthetic_image_media(ids, _bmp_encode, id_col, grid, cell_px)


def synthetic_png_media(
    ids: DataFrame, id_col: str = "media_id", grid: int = 4, cell_px: int = 4
) -> DataFrame:
    """The PNG twin of synthetic_bmp_media (r6): the same closed-form
    grid-pattern images, encoded with the REAL PNG encoder — so the
    DEFLATE+unfilter decode path is exercised end to end while the
    pooled features stay oracle-checkable closed-form."""
    return _synthetic_image_media(ids, _png_encode, id_col, grid, cell_px)


def _synthetic_image_media(
    ids: DataFrame, encode, id_col: str, grid: int, cell_px: int
) -> DataFrame:
    side = grid * cell_px

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for mid in pdf[id_col]:
                payloads.append(encode(_pattern_img((int(mid) % 65535) + 1, grid, cell_px)))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64").values,
                    "media_type": "image",
                    "payload": payloads,
                    "meta_width": np.int32(side),
                    "meta_height": np.int32(side),
                    "meta_duration_ms": pd.array([None] * len(pdf), dtype="Int32"),
                }
            )

    return ids.select(F.col(id_col)).mapInPandas(kernel, MEDIA_SCHEMA)


def synthetic_avi_media(
    ids: DataFrame,
    id_col: str = "media_id",
    n_frames: int = 6,
    grid: int = 4,
    cell_px: int = 4,
    usec_per_frame: int = 100_000,
) -> DataFrame:
    """Deterministic AVI corpus: one `n_frames`-frame uncompressed-DIB
    clip per id, generated executor-side with the REAL encoder
    (`_avi_encode`). Frame f shows the BMP-style bit-pattern grid of
    `((id + f) % 65535) + 1`, so sampled frames and the clip-level
    temporal-mean feature are both closed-form checkable."""
    side = grid * cell_px

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for mid in pdf[id_col]:
                frames = [
                    _pattern_img(((int(mid) + f) % 65535) + 1, grid, cell_px)
                    for f in range(n_frames)
                ]
                payloads.append(_avi_encode(frames, usec_per_frame))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64").values,
                    "media_type": "video",
                    "payload": payloads,
                    "meta_width": np.int32(side),
                    "meta_height": np.int32(side),
                    "meta_duration_ms": np.int32(n_frames * usec_per_frame // 1000),
                }
            )

    return ids.select(F.col(id_col)).mapInPandas(kernel, MEDIA_SCHEMA)


def synthetic_wav_media(
    ids: DataFrame, id_col: str = "media_id", rate: int = 8000, window_frames: int = 64
) -> DataFrame:
    """Deterministic WAV corpus: one 16-bit PCM mono clip per id,
    generated executor-side with the REAL encoder (`_wav_encode`).

    Each id maps to the 8-bit pattern `(id % 255) + 1`: feature window
    i carries a full-scale ±0.5 square wave (period 4 frames) iff bit
    i is set, else silence. Windowed RMS is then exactly
    0.5·bit·(32767·0.5 rounded / 32768 precision) per component and
    the zero-crossing rate is bit·(1/2 - edge term) — closed-form
    checkable like the BMP bit-pattern corpus (test_multimodal)."""
    n_frames = _WAV_WINDOWS * window_frames

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            base = np.tile(np.array([0.5, 0.5, -0.5, -0.5], np.float32), n_frames // 4 + 1)[
                :n_frames
            ]
            for mid in pdf[id_col]:
                p = (int(mid) % 255) + 1
                mask = np.zeros(n_frames, np.float32)
                for i in range(_WAV_WINDOWS):
                    if (p >> i) & 1:
                        mask[i * window_frames : (i + 1) * window_frames] = 1.0
                payloads.append(_wav_encode(base * mask, rate))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64").values,
                    "media_type": "audio",
                    "payload": payloads,
                    "meta_width": pd.array([None] * len(pdf), dtype="Int32"),
                    "meta_height": pd.array([None] * len(pdf), dtype="Int32"),
                    "meta_duration_ms": np.int32(n_frames * 1000 // rate),
                }
            )

    return ids.select(F.col(id_col)).mapInPandas(kernel, MEDIA_SCHEMA)


_DECODED_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def decode_meta(media: DataFrame, fake: bool = False) -> DataFrame:
    """DECODED (not declared) image dimensions + payload size — the
    header-parse slice of the real codec path. BMP and PNG payloads
    report the dimensions the decoder actually produced; other formats
    fall back to the declared meta columns under fake=True (same
    totality rule as extract_features) or raise."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            widths, heights = [], []
            for p, mw, mh in zip(pdf["payload"], pdf["meta_width"], pdf["meta_height"]):
                b = bytes(p)
                if _is_bmp(b) or _is_png(b):
                    try:
                        img = _bmp_decode(b) if _is_bmp(b) else _png_decode(b)
                        heights.append(int(img.shape[0]))
                        widths.append(int(img.shape[1]))
                        continue
                    except ValueError:
                        if not fake:
                            raise
                if fake:
                    widths.append(None if pd.isna(mw) else int(mw))
                    heights.append(None if pd.isna(mh) else int(mh))
                else:
                    raise NotImplementedError(
                        "non-BMP/PNG media decode requires an image/audio codec; "
                        "run with fake=True to fall back to declared metadata"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.select(
        "media_id", "media_type", "payload", "meta_width", "meta_height"
    ).mapInPandas(kernel, _DECODED_META_SCHEMA)


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
