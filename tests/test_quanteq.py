"""quanteq estimation tool tests (aku/quanteq.cc)."""

import wave

import numpy as np

from aaltoasr_tpu.cli.quanteq import compute_quantiles, grid_search


class TestGridSearch:
    def test_identity_when_quantiles_match(self):
        """If the utterance quantiles equal the training quantiles, the
        best warp is the identity (alpha=1 or gamma=1 territory gives
        zero error at alpha=0 already since r maps to itself)."""
        qt = np.array([0.25, 0.5, 0.75, 1.0])
        quant = np.tile(qt, (3, 1))
        a, g, qmax = grid_search(quant, qt, 0.05, 0.05, 3.0)
        # alpha=0 makes the warp exactly linear r -> r: zero error,
        # and it is the first grid point visited (reference order)
        np.testing.assert_allclose(a, 0.0)
        np.testing.assert_allclose(qmax, 1.0)

    def test_compression_found(self):
        """Utterance quantiles uniformly hotter than training: the
        selected warp must compress (score below linear map)."""
        qt = np.array([0.1, 0.3, 0.6, 1.0])
        quant = np.array([[0.4, 0.65, 0.85, 1.0]])
        a, g, qmax = grid_search(quant, qt, 0.02, 0.02, 3.0)
        r = quant[0, :-1]
        warped = qmax[0] * (a[0] * r ** g[0] + (1 - a[0]) * r)
        lin_err = ((r * qmax[0] - qt[:-1]) ** 2).sum()
        best_err = ((warped - qt[:-1]) ** 2).sum()
        assert best_err < lin_err
        assert g[0] > 1.0  # compressive exponent

    def test_quantile_convention(self):
        """quanteq.cc:48-52 index convention and lower-bound clamp."""
        fea = [list(np.arange(1.0, 9.0))]  # n=8, channels=1
        qt = np.array([3.0, 4.0, 6.0, 8.0])
        q = compute_quantiles(fea, qt, 4)
        # ceil(8*(j+1)/4)-1 = 1,3,5,7 -> values 2,4,6,8; 2 clamps to 3
        np.testing.assert_allclose(q[0], [3.0, 4.0, 6.0, 8.0])


class TestQuantEqCli:
    def test_end_to_end(self, tmp_path):
        from aaltoasr_tpu.cli.quanteq import main
        from aaltoasr_tpu.formats.spkc import SpeakerConfig

        cfg = tmp_path / "q.cfg"
        cfg.write_text("""\
module
{
  name audio
  type audiofile
  sample_rate 16000
}
module
{
  name fft
  type fft
  sources audio
}
module
{
  name mel
  type mel
  sources fft
}
module
{
  name qe
  type quanteq
  sources mel
  quant_train 0.5 1.0 1.5 2.0
}
""")
        rng = np.random.default_rng(0)
        lines = []
        for u in range(2):
            sig = (3000 * np.sin(2 * np.pi * (250 + 50 * u)
                   * np.arange(3200) / 16000)
                   + 300 * rng.standard_normal(3200)).astype("<i2")
            wav = tmp_path / f"u{u}.wav"
            with wave.open(str(wav), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(sig.tobytes())
            lines.append(f"audio={wav} utterance=utt{u}")
        rec = tmp_path / "q.recipe"
        rec.write_text("\n".join(lines) + "\n")
        out = tmp_path / "out.spkc"
        rc = main(["-c", str(cfg), "-r", str(rec), "-q", "qe",
                   "-o", str(out)])
        assert rc == 0
        spkc = SpeakerConfig.load(out)
        assert set(spkc.utterances) == {"utt0", "utt1"}
        mc = spkc.utterances["utt1"][("feature", "qe")]
        for key in ("alpha", "gamma", "quant_max"):
            vec = mc.get_float_vec(key)
            assert vec is not None and len(vec) > 0

    def test_wrong_module_type(self, tmp_path):
        from aaltoasr_tpu.cli.quanteq import main
        cfg = tmp_path / "q.cfg"
        cfg.write_text("""\
module
{
  name audio
  type audiofile
  sample_rate 16000
}
module
{
  name fft
  type fft
  sources audio
}
""")
        rec = tmp_path / "q.recipe"
        rec.write_text("audio=/nonexistent.wav\n")
        assert main(["-c", str(cfg), "-r", str(rec), "-q", "fft"]) == 1
