"""Audio file reading for the frontend.

The reference reads through libsndfile as 16-bit shorts without scaling
(`aku/AudioReader.cc:197` sf_read_short), with a RAW fallback and explicit
endianness control (`aku/AudioReader.hh:44-96`).  Feature values therefore
operate on the int16 range; we return float32 arrays of those values.

Supports: WAV (PCM 8/16/24/32-bit and float via the stdlib/scipy readers)
and headerless RAW shorts.  Other libsndfile formats (FLAC, AU, ...) are
out of scope for now.
"""

from __future__ import annotations

import os
import wave

import numpy as np


def read_wav(path) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 samples in int16 scale, sample_rate)."""
    with wave.open(str(path), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    elif width == 1:
        # 8-bit WAV is unsigned; libsndfile maps to shorts by << 8
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                - 128.0) * 256.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 65536.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        v = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        data = v.astype(np.float32) / 256.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        data = data.reshape(-1, channels).mean(axis=1)
    return data, rate


def read_raw(path, endian: str = "little") -> np.ndarray:
    """Headerless 16-bit RAW -> float32 samples (AudioReader RAW fallback)."""
    dtype = "<i2" if endian == "little" else ">i2"
    return np.fromfile(path, dtype=dtype).astype(np.float32)


def read_audio(path, sample_rate: int | None = None,
               endian: str = "little") -> tuple[np.ndarray, int]:
    """Dispatch on extension; RAW requires the caller's sample_rate."""
    ext = os.path.splitext(str(path))[1].lower()
    if ext in (".wav", ".wave"):
        return read_wav(path)
    if sample_rate is None:
        raise ValueError("raw audio requires an explicit sample_rate")
    return read_raw(path, endian), sample_rate
