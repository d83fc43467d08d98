"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a struct of metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms.  The container has no image/audio codecs, so
REAL codec decode raises NotImplementedError behind a clearly marked stub —
but everything Spark-side (schema, batching, partitioning, UDF signatures)
is real and tested against a deterministic FAKE container format:

    b"FAKEIMG1" + width:int32le + height:int32le + pixel bytes (w*h, gray)
    b"FAKEVID1" + n_frames:int32le + frame payloads (each 16 bytes)
    b"FAKEAUD1" + rate:int32le + n_samples:int32le + int16le PCM samples

Feature extraction on the fake format is genuine numpy work (header parse,
byte histograms, mean/std, frame sampling) — the exact batch shape a PIL/
ffmpeg implementation would slot into.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, StructField, StructType
)

FAKE_IMG_MAGIC = b"FAKEIMG1"
FAKE_VID_MAGIC = b"FAKEVID1"
FAKE_AUD_MAGIC = b"FAKEAUD1"

IMG_FEATURE_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_px", DoubleType()),
        StructField("std_px", DoubleType()),
        StructField("hist8", ArrayType(DoubleType())),
    ]
)


def make_fake_image(width: int, height: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, width * height, dtype=np.uint8).tobytes()
    return FAKE_IMG_MAGIC + struct.pack("<ii", width, height) + px


# Weyl-style mixing constants (Knuth multiplicative / xxhash prime — public)
_PORTABLE_C1 = 2654435761
_PORTABLE_C2 = 2246822519


def make_fake_image_portable(width: int, height: int, seed: int) -> bytes:
    """Same container as ``make_fake_image`` but pixels come from a
    CLOSED-FORM integer sequence, p_k = (seed*C1 + k*C2) mod 256, instead
    of numpy's MT19937 — so a SQL oracle can re-derive every pixel (and
    thus mean/std/hist) arithmetically while the Spark side still decodes
    the actual bytes through the real mapInPandas path."""
    px = bytes(
        (seed * _PORTABLE_C1 + k * _PORTABLE_C2) % 256
        for k in range(width * height)
    )
    return FAKE_IMG_MAGIC + struct.pack("<ii", width, height) + px


def make_fake_audio_portable(rate: int, n_samples: int, seed: int) -> bytes:
    """Closed-form int16 PCM, s_k = ((seed*C1 + k*C2) mod 4096) - 2048 —
    see ``make_fake_image_portable``."""
    pcm = np.array(
        [
            (seed * _PORTABLE_C1 + k * _PORTABLE_C2) % 4096 - 2048
            for k in range(n_samples)
        ],
        dtype="<i2",
    )
    return FAKE_AUD_MAGIC + struct.pack("<ii", rate, n_samples) + pcm.tobytes()


def make_fake_video_portable(n_frames: int, seed: int) -> bytes:
    """Closed-form frame bytes p_k = (seed*C1 + k*C2) mod 256 over
    n_frames*16 bytes — see ``make_fake_image_portable``; lets a SQL
    oracle re-derive every sampled frame's mean arithmetically."""
    fb = bytes(
        (seed * _PORTABLE_C1 + k * _PORTABLE_C2) % 256
        for k in range(n_frames * 16)
    )
    return FAKE_VID_MAGIC + struct.pack("<i", n_frames) + fb


def make_fake_video(n_frames: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, n_frames * 16, dtype=np.uint8).tobytes()
    return FAKE_VID_MAGIC + struct.pack("<i", n_frames) + frames


def make_fake_audio(rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    pcm = rng.randint(-2048, 2048, n_samples).astype("<i2").tobytes()
    return FAKE_AUD_MAGIC + struct.pack("<ii", rate, n_samples) + pcm


def _decode_audio(buf: bytes) -> tuple[int, np.ndarray]:
    """-> (sample_rate, int16 PCM)."""
    if buf[:8] == FAKE_AUD_MAGIC:
        rate, n = struct.unpack("<ii", buf[8:16])
        pcm = np.frombuffer(buf, dtype="<i2", offset=16, count=n)
        return rate, pcm
    # STUB: real codec path — would be soundfile.read(io.BytesIO(buf))
    raise NotImplementedError("real audio codecs unavailable in this environment")


AUD_FEATURE_SCHEMA = StructType(
    [
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zero_cross_rate", DoubleType()),
    ]
)


def with_audio_features(
    df: DataFrame, payload_col: str = "payload", out_col: str = "aud_features"
) -> DataFrame:
    """mapInPandas batch decode: duration / RMS / zero-crossing rate per
    clip — the shapes a real librosa/soundfile stage would produce."""
    out_schema = StructType(df.schema.fields + [StructField(out_col, AUD_FEATURE_SCHEMA)])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf[payload_col]:
                if buf is None:
                    feats.append(None)
                    continue
                try:
                    rate, pcm = _decode_audio(bytes(buf))
                except NotImplementedError:
                    feats.append(None)
                    continue
                x = pcm.astype(np.float64)
                zc = int(np.count_nonzero(np.diff(np.signbit(x)))) if len(x) > 1 else 0
                feats.append(
                    {
                        "sample_rate": rate,
                        "n_samples": int(len(x)),
                        "duration_sec": len(x) / rate if rate else 0.0,
                        "rms": float(np.sqrt((x * x).mean())) if len(x) else 0.0,
                        "zero_cross_rate": zc / max(len(x) - 1, 1),
                    }
                )
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(decode, out_schema)


def resample_audio(
    df: DataFrame,
    payload_col: str = "payload",
    target_rate: int = 8000,
    out_col: str = "resampled",
) -> DataFrame:
    """Integer-factor decimation with block-mean anti-aliasing (the real
    version would swap in a polyphase resampler); output = float64 samples
    at ~target_rate."""
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = []
            for buf in pdf[payload_col]:
                try:
                    rate, pcm = (
                        _decode_audio(bytes(buf)) if buf is not None else (0, None)
                    )
                except NotImplementedError:
                    res.append(None)
                    continue
                if pcm is None or rate < target_rate or len(pcm) == 0:
                    res.append(None)
                    continue
                k = max(rate // target_rate, 1)
                x = pcm.astype(np.float64)
                x = x[: (len(x) // k) * k]
                res.append(x.reshape(-1, k).mean(axis=1).round(4).tolist())
            pdf = pdf.copy()
            pdf[out_col] = res
            yield pdf

    return df.mapInPandas(work, out_schema)


def _decode_image(buf: bytes) -> tuple[int, int, np.ndarray]:
    if buf[:8] == FAKE_IMG_MAGIC:
        w, h = struct.unpack("<ii", buf[8:16])
        px = np.frombuffer(buf, dtype=np.uint8, offset=16, count=w * h)
        return w, h, px
    # STUB: real codec path — would be PIL.Image.open(io.BytesIO(buf))
    raise NotImplementedError("real image codecs unavailable in this environment")


def with_image_features(
    df: DataFrame, payload_col: str = "payload", out_col: str = "img_features"
) -> DataFrame:
    """mapInPandas batch decode: one numpy pass per Arrow batch."""
    out_schema = StructType(df.schema.fields + [StructField(out_col, IMG_FEATURE_SCHEMA)])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf[payload_col]:
                if buf is None:
                    feats.append(None)
                    continue
                try:
                    w, h, px = _decode_image(bytes(buf))
                except NotImplementedError:
                    feats.append(None)
                    continue
                hist = np.histogram(px, bins=8, range=(0, 256))[0]
                feats.append(
                    {
                        "width": w,
                        "height": h,
                        "mean_px": float(px.mean()) if len(px) else 0.0,
                        "std_px": float(px.std()) if len(px) else 0.0,
                        "hist8": (hist / max(len(px), 1)).tolist(),
                    }
                )
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(decode, out_schema)


def resize_images(
    df: DataFrame, payload_col: str = "payload", target: int = 8, out_col: str = "thumb"
) -> DataFrame:
    """'Resize' = block-mean downsample of the fake grayscale grid to
    target x target doubles — the real-codec version would swap the decode."""
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for buf in pdf[payload_col]:
                try:
                    w, h, px = _decode_image(bytes(buf)) if buf is not None else (0, 0, None)
                except NotImplementedError:
                    thumbs.append(None)
                    continue
                if not px is None and w >= target and h >= target:
                    img = px.reshape(h, w).astype(np.float64)
                    bh, bw = h // target, w // target
                    small = img[: bh * target, : bw * target].reshape(
                        target, bh, target, bw
                    ).mean(axis=(1, 3))
                    thumbs.append(small.reshape(-1).round(4).tolist())
                else:
                    thumbs.append(None)
            pdf = pdf.copy()
            pdf[out_col] = thumbs
            yield pdf

    return df.mapInPandas(work, out_schema)


def sample_video_frames(
    df: DataFrame, payload_col: str = "payload", every_k: int = 4, out_col: str = "frame_means"
) -> DataFrame:
    """Frame sampling: every k-th 16-byte frame's mean as a double array."""
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = []
            for buf in pdf[payload_col]:
                b = bytes(buf) if buf is not None else b""
                if b[:8] != FAKE_VID_MAGIC:
                    res.append(None)
                    continue
                (n,) = struct.unpack("<i", b[8:12])
                frames = np.frombuffer(b, dtype=np.uint8, offset=12, count=n * 16)
                frames = frames.reshape(n, 16)
                sampled = frames[::every_k]
                res.append(sampled.mean(axis=1).round(4).tolist())
            pdf = pdf.copy()
            pdf[out_col] = res
            yield pdf

    return df.mapInPandas(work, out_schema)
