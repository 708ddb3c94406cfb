"""playseg CLI: stdin segment protocol -> WAV/raw sinks."""

import io
import sys
import wave

import numpy as np


def _wav(path, sig, rate=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(sig.astype("<i2").tobytes())


def test_segments_to_wav_dir(tmp_path, monkeypatch, capsys):
    from aaltoasr_tpu.cli.playseg import main
    sig = (np.arange(8000) % 256 * 100 - 12800).astype(np.int16)
    _wav(tmp_path / "a.wav", sig)
    # .phn convention: sample numbers at 16 kHz (time unit 62.5 us)
    stdin = io.StringIO(
        f"{tmp_path}/a.wav\n"
        "0 1600 _\n"
        "1600 4800 a\n"
        "9999999 10000000 out_of_range\n"
        "bogus line here\n")
    monkeypatch.setattr(sys, "stdin", stdin)
    rc = main(["--wav", str(tmp_path / "segs")])
    assert rc == 0
    with wave.open(str(tmp_path / "segs" / "seg0000.wav")) as w:
        assert w.getnframes() == 1600
    with wave.open(str(tmp_path / "segs" / "seg0001.wav")) as w:
        data = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    assert np.array_equal(data, sig[1600:4800])
    err = capsys.readouterr().err
    assert "skipping" in err


def test_raw_output_append(tmp_path, monkeypatch):
    from aaltoasr_tpu.cli.playseg import main
    sig = np.linspace(-30000, 30000, 4000).astype(np.int16)
    _wav(tmp_path / "b.wav", sig)
    stdin = io.StringIO(f"{tmp_path}/b.wav\n0 1000\n1000 2000\n")
    monkeypatch.setattr(sys, "stdin", stdin)
    out = tmp_path / "out.raw"
    rc = main(["-O", str(out)])
    assert rc == 0
    data = np.frombuffer(out.read_bytes(), "<i2")
    assert np.array_equal(data, sig[:2000])
