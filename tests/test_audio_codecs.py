"""Audio codecs beyond PCM16 WAV (AudioReader.cc:92 semantics)."""

import struct

import numpy as np
import pytest

from aaltoasr_tpu.frontend import audio


def g711_mulaw_encode(x):
    x = np.clip(x.astype(np.int32), -32635, 32635)
    sign = (x < 0).astype(np.uint8) * 0x80
    mag = np.abs(x) + 0x84
    exponent = np.floor(np.log2(mag >> 7)).astype(np.int32)
    exponent = np.clip(exponent, 0, 7)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent.astype(np.uint8) << 4)
              | mantissa.astype(np.uint8))).astype(np.uint8)


class TestG711:
    def test_mulaw_roundtrip(self):
        rng = np.random.default_rng(0)
        x = (rng.normal(0, 5000, 500)).astype(np.int16)
        enc = g711_mulaw_encode(x)
        dec = audio.decode_mulaw(enc.tobytes())
        # mu-law quantization error grows with amplitude
        err = np.abs(dec - x)
        tol = np.maximum(np.abs(x) * 0.06, 40)
        assert np.all(err <= tol)

    def test_mulaw_against_audioop(self):
        audioop = pytest.importorskip("audioop")
        raw = bytes(range(256))
        ours = audio.decode_mulaw(raw)
        ref = np.frombuffer(audioop.ulaw2lin(raw, 2), dtype="<i2")
        np.testing.assert_allclose(ours, ref.astype(np.float32),
                                   atol=4)

    def test_alaw_against_audioop(self):
        audioop = pytest.importorskip("audioop")
        raw = bytes(range(256))
        ours = audio.decode_alaw(raw)
        ref = np.frombuffer(audioop.alaw2lin(raw, 2), dtype="<i2")
        np.testing.assert_allclose(ours, ref.astype(np.float32),
                                   atol=8)


def write_wav_tagged(path, tag, rate, payload):
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8)
    data = payload
    riff = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)


class TestContainers:
    def test_mulaw_wav(self, tmp_path):
        rng = np.random.default_rng(1)
        x = rng.normal(0, 4000, 300).astype(np.int16)
        enc = g711_mulaw_encode(x)
        p = tmp_path / "u.wav"
        write_wav_tagged(p, 7, 8000, enc.tobytes())
        samples, rate = audio.read_audio(p)
        assert rate == 8000
        assert np.all(np.abs(samples - x)
                      <= np.maximum(np.abs(x) * 0.06, 40))

    def test_aiff_pcm16(self, tmp_path):
        x = np.asarray([0, 1000, -1000, 32000, -32000], np.int16)
        # 80-bit extended for 16000: exp=16396+? compute: 16000 =
        # 1.953125 * 2^13 -> exponent field 16383+13, mantissa top bits
        exp = 16383 + 13
        mant = int(16000 / (2 ** 13) * (1 << 63))
        comm = struct.pack(">hIh", 1, len(x), 16) + struct.pack(
            ">HII", exp, (mant >> 32) & 0xFFFFFFFF, mant & 0xFFFFFFFF)
        ssnd = struct.pack(">II", 0, 0) + x.astype(">i2").tobytes()
        body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
                + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
        p = tmp_path / "u.aiff"
        with open(p, "wb") as f:
            f.write(b"FORM" + struct.pack(">I", len(body)) + body)
        samples, rate = audio.read_audio(p)
        assert rate == 16000
        np.testing.assert_allclose(samples, x.astype(np.float32))

    def test_au_pcm16_and_mulaw(self, tmp_path):
        x = np.asarray([0, 500, -500, 12345, -12345], np.int16)
        hdr = struct.pack(">IIIII", 24, len(x) * 2, 3, 16000, 1)
        p = tmp_path / "u.au"
        with open(p, "wb") as f:
            f.write(b".snd" + hdr[:] + x.astype(">i2").tobytes())
        samples, rate = audio.read_audio(p)
        assert rate == 16000
        np.testing.assert_allclose(samples, x.astype(np.float32))
        enc = g711_mulaw_encode(x)
        hdr = struct.pack(">IIIII", 24, len(enc), 1, 8000, 1)
        p2 = tmp_path / "v.au"
        with open(p2, "wb") as f:
            f.write(b".snd" + hdr + enc.tobytes())
        samples, rate = audio.read_audio(p2)
        assert rate == 8000
        assert np.all(np.abs(samples - x)
                      <= np.maximum(np.abs(x) * 0.06, 40))
