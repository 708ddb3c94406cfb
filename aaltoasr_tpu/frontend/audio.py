"""Audio file reading for the frontend.

The reference reads through libsndfile as 16-bit shorts without scaling
(`aku/AudioReader.cc:197` sf_read_short), with a RAW fallback and explicit
endianness control (`aku/AudioReader.hh:44-96`).  Feature values therefore
operate on the int16 range; we return float32 arrays of those values.

Supports: WAV (PCM 8/16/24/32-bit, A-law, mu-law, extensible), AIFF/
AIFF-C (PCM/sowt/ulaw/alaw), Sun AU (mu-law/A-law/PCM), and headerless
RAW shorts — the formats ASR corpora actually use of libsndfile's set.
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
        try:
            return read_wav(path)
        except Exception:
            # compressed (A-law / mu-law / extensible) WAVs that the
            # stdlib reader rejects
            return read_wav_any(path)
    if ext in (".aif", ".aiff", ".aifc"):
        return read_aiff(path)
    if ext in (".au", ".snd"):
        return read_au(path)
    if sample_rate is None:
        raise ValueError("raw audio requires an explicit sample_rate")
    return read_raw(path, endian), sample_rate


# ---------------------------------------------------------------------------
# companded and non-RIFF codecs (AudioReader.cc:92 reads anything
# libsndfile does; these cover the formats ASR corpora actually use)
# ---------------------------------------------------------------------------

def decode_mulaw(raw: bytes) -> np.ndarray:
    """G.711 mu-law bytes -> float32 int16-scale samples."""
    u = ~np.frombuffer(raw, dtype=np.uint8)
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa.astype(np.int32) << 3) + 0x84)
           << exponent.astype(np.int32)) - 0x84
    return np.where(sign != 0, -mag, mag).astype(np.float32)


def decode_alaw(raw: bytes) -> np.ndarray:
    """G.711 A-law bytes -> float32 int16-scale samples."""
    a = np.frombuffer(raw, dtype=np.uint8) ^ 0x55
    sign = a & 0x80
    exponent = (a >> 4) & 0x07
    mantissa = (a & 0x0F).astype(np.int32)
    mag = np.where(exponent == 0, (mantissa << 4) + 8,
                   ((mantissa << 4) + 0x108)
                   << np.maximum(exponent.astype(np.int32) - 1, 0))
    # A-law sign bit SET means positive (opposite of mu-law)
    return np.where(sign != 0, mag, -mag).astype(np.float32)


def _pcm_to_float(raw: bytes, width: int, big_endian: bool) -> np.ndarray:
    if width == 2:
        return np.frombuffer(raw, dtype=">i2" if big_endian else "<i2"
                             ).astype(np.float32)
    if width == 1:
        return np.frombuffer(raw, dtype=np.int8).astype(np.float32) * 256.0
    if width == 4:
        return np.frombuffer(raw, dtype=">i4" if big_endian else "<i4"
                             ).astype(np.float32) / 65536.0
    if width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        if big_endian:
            b = b[:, ::-1]
        v = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return v.astype(np.float32) / 256.0
    raise ValueError(f"unsupported PCM width {width}")


def read_wav_any(path) -> tuple[np.ndarray, int]:
    """RIFF parser covering compressed fmt tags the stdlib rejects:
    6 = A-law, 7 = mu-law (+ WAVE_FORMAT_EXTENSIBLE indirection)."""
    import struct
    with open(path, "rb") as f:
        riff = f.read()
    if riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(riff):
        cid = riff[pos:pos + 4]
        (size,) = struct.unpack("<I", riff[pos + 4:pos + 8])
        body = riff[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16])
    if tag == 0xFFFE and len(fmt) >= 26:      # extensible
        (tag,) = struct.unpack("<H", fmt[24:26])
    if tag == 1:
        samples = _pcm_to_float(data, bits // 8, big_endian=False)
    elif tag == 6:
        samples = decode_alaw(data)
    elif tag == 7:
        samples = decode_mulaw(data)
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate


def read_aiff(path) -> tuple[np.ndarray, int]:
    """AIFF/AIFF-C PCM reader (the stdlib aifc module was removed in
    Python 3.12): FORM/COMM/SSND chunks, big-endian samples, 80-bit
    extended-float sample rate."""
    import struct
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != b"FORM" or raw[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF file")
    pos = 12
    comm = ssnd = None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        (size,) = struct.unpack(">I", raw[pos + 4:pos + 8])
        body = raw[pos + 8:pos + 8 + size]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        raise ValueError("missing COMM/SSND chunk")
    channels, _nframes, bits = struct.unpack(">hIh", comm[:8])
    # 80-bit IEEE extended float sample rate
    exp = struct.unpack(">H", comm[8:10])[0]
    mant_hi, mant_lo = struct.unpack(">II", comm[10:18])
    sign = -1.0 if exp & 0x8000 else 1.0
    exp &= 0x7FFF
    mant = (mant_hi << 32) | mant_lo
    rate = int(sign * mant * 2.0 ** (exp - 16383 - 63)) if mant else 0
    compression = comm[18:22] if len(comm) > 18 else b"NONE"
    data = ssnd[8:]                           # skip offset/blocksize
    if compression in (b"NONE", b"sowt"):
        little = compression == b"sowt"
        samples = _pcm_to_float(data, bits // 8, big_endian=not little)
    elif compression == b"ulaw":
        samples = decode_mulaw(data)
    elif compression == b"alaw":
        samples = decode_alaw(data)
    else:
        raise ValueError(f"unsupported AIFF compression {compression!r}")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate


def read_au(path) -> tuple[np.ndarray, int]:
    """Sun/NeXT .au reader: big-endian header, encodings 1 (mu-law),
    2 (int8), 3 (int16), 27 (A-law)."""
    import struct
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != b".snd":
        raise ValueError("not an AU file")
    offset, _size, encoding, rate, channels = struct.unpack(
        ">IIIII", raw[4:24])
    data = raw[offset:]
    if encoding == 1:
        samples = decode_mulaw(data)
    elif encoding == 2:
        samples = _pcm_to_float(data, 1, big_endian=True)
    elif encoding == 3:
        samples = _pcm_to_float(data, 2, big_endian=True)
    elif encoding == 27:
        samples = decode_alaw(data)
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate
