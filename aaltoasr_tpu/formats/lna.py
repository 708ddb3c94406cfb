"""LNA state log-probability files — exact reference codec.

Layout (`aku/doc/fileformats.html`): 4-byte big-endian state count, 1 byte
"bytes per probability" (1, 2 or 4), then frame-major quantized log-probs.

Quantization (`aku/PhoneProbsToolbox.cc:93-124`):
* 2-byte: ``v = int(-1820.0 * logprob + 0.5)`` stored big-endian; values
  below −36.008 are floored to 0xFFFF.
* 4-byte: the raw float32 little-endian (host order on LE machines; the
  reference byte-swaps only on BE hosts).
* 1-byte: ``v = int(-24 * logprob + 0.5)`` capped at 255 (NOWAY legacy;
  `decoder/src/LnaReaderCircular.cc:188-196` dequantizes by /-24).

Dequantization (`decoder/src/LnaReaderCircular.cc:170-196`):
``lp = (hi*256 + lo) / -1820.0`` for 2-byte, raw float for 4-byte,
``lp = byte / -24.0`` for 1-byte.

This module is the host-side NumPy codec.  A vectorized on-device encoder
lives in `aaltoasr_tpu.ops.gmm` for the phone_probs path.
"""

from __future__ import annotations

import struct

import numpy as np

LNA_2BYTE_SCALE = -1820.0
LNA_2BYTE_FLOOR = -36.008
LNA_1BYTE_SCALE = -24.0


def quantize_lna(log_probs: np.ndarray, lna_bytes: int = 2) -> bytes:
    """Quantize [T, S] float log-probs to the LNA payload bytes."""
    lp = np.asarray(log_probs)
    if lna_bytes == 4:
        return lp.astype("<f4").tobytes()
    if lna_bytes == 2:
        # int cast truncates toward zero like C; values are >= 0 here
        v = (-1820.0 * lp.astype(np.float64) + 0.5).astype(np.int64)
        v = np.where(lp < LNA_2BYTE_FLOOR, 0xFFFF, v)
        v = np.clip(v, 0, 0xFFFF)
        return v.astype(">u2").tobytes()
    if lna_bytes == 1:
        v = (-24.0 * lp.astype(np.float64) + 0.5).astype(np.int64)
        v = np.clip(v, 0, 255)
        return v.astype(np.uint8).tobytes()
    raise ValueError(f"unsupported lna_bytes {lna_bytes}")


def dequantize_lna(payload: bytes, num_states: int, lna_bytes: int) -> np.ndarray:
    """Decode LNA payload -> [T, S] float32 log-probs."""
    if lna_bytes == 4:
        arr = np.frombuffer(payload, dtype="<f4")
    elif lna_bytes == 2:
        arr = np.frombuffer(payload, dtype=">u2").astype(np.float32) / -1820.0
    elif lna_bytes == 1:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32) / -24.0
    else:
        raise ValueError(f"unsupported lna_bytes {lna_bytes}")
    frames = arr.size // num_states
    return arr[: frames * num_states].reshape(frames, num_states).astype(np.float32)


def write_lna(path_or_file, log_probs: np.ndarray, lna_bytes: int = 2) -> None:
    """Write a complete LNA file for [T, S] log-probs."""
    num_states = int(log_probs.shape[1])
    header = struct.pack(">i", num_states) + bytes([lna_bytes])
    payload = quantize_lna(log_probs, lna_bytes)
    if hasattr(path_or_file, "write"):
        path_or_file.write(header + payload)
    else:
        with open(path_or_file, "wb") as f:
            f.write(header + payload)


def read_lna(path_or_file) -> tuple[np.ndarray, int]:
    """Read an LNA file -> ([T, S] float32 log-probs, lna_bytes)."""
    if hasattr(path_or_file, "read"):
        data = path_or_file.read()
    else:
        with open(path_or_file, "rb") as f:
            data = f.read()
    num_states = struct.unpack(">i", data[:4])[0]
    lna_bytes = data[4]
    return dequantize_lna(data[5:], num_states, lna_bytes), lna_bytes
