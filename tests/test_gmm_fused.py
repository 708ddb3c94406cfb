"""Fused GMM state-likelihood kernel (ops/gmm_pallas.py) vs the base
scoring path (ops/gmm.py) — same math up to logsumexp reduction order.

Runs the Pallas kernel in interpret mode on CPU; on-TPU timing and the
measured numeric delta live in the DESIGN.md roofline note.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aaltoasr_tpu.formats.model_io import HmmModel
from aaltoasr_tpu.ops.gmm import GmmScorer
from aaltoasr_tpu.ops.gmm_pallas import FusedGmmScorer


def _model(G=40, S=12, D=7, K=3, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(0, 1, (G, D))
    covars = rng.uniform(0.3, 2.0, (G, D))
    mixtures = []
    for s in range(S):
        k = int(rng.integers(1, K + 1))
        idx = rng.choice(G, size=k, replace=False).astype(np.int64)
        w = rng.uniform(0.1, 1.0, k)
        mixtures.append((idx, w / w.sum()))
    return HmmModel(dim=D, cov_type="diagonal_cov", means=means,
                    covars=covars, mixtures=mixtures)


class TestFusedGmm:
    def test_state_ll_matches_base_path(self):
        model = _model()
        sc = GmmScorer.from_model(model)
        fsc = FusedGmmScorer.from_scorer(sc)
        rng = np.random.default_rng(1)
        f = jnp.asarray(rng.normal(0, 2, (17, 7)).astype(np.float32))
        base = np.asarray(sc.state_log_likelihoods(f))[:, :12]
        fused = np.asarray(
            fsc.state_log_likelihoods(f, interpret=True))[:, :12]
        np.testing.assert_allclose(fused, base, rtol=0, atol=1e-4)

    def test_lna_matches_base_path(self):
        model = _model(seed=2)
        sc = GmmScorer.from_model(model)
        fsc = FusedGmmScorer.from_scorer(sc)
        rng = np.random.default_rng(3)
        f = jnp.asarray(rng.normal(0, 2, (9, 7)).astype(np.float32))
        base = np.asarray(sc.lna_log_probs(f))
        fused = np.asarray(fsc.lna_log_probs(f, interpret=True))
        np.testing.assert_allclose(fused, base, rtol=0, atol=1e-4)

    def test_padded_state_columns_are_log_zero(self):
        model = _model(S=5)
        sc = GmmScorer.from_model(model)
        fsc = FusedGmmScorer.from_scorer(sc)
        rng = np.random.default_rng(4)
        f = jnp.asarray(rng.normal(0, 2, (4, 7)).astype(np.float32))
        out = np.asarray(fsc.state_log_likelihoods(f, interpret=True))
        assert out.shape[1] >= 5
        assert (out[:, 5:] < -1e29).all()

    def test_phone_probs_fused_lna_matches(self, tmp_path):
        """WAV -> 2-byte LNA with fused vs baseline scoring: quantized
        codes may differ by at most 1 step (reduction-order delta is
        below the 1/1820 quantization resolution)."""
        import wave
        from aaltoasr_tpu.models.phone_probs import PhoneProbs
        from aaltoasr_tpu.formats.lna import read_lna
        from aaltoasr_tpu.formats.feaconf import FeatureConfig
        from tests.test_gmm import random_model
        from tests.test_frontend import cfg_mfcc_full, make_audio

        model = random_model(G=24, S=9, D=39, seed=8)
        audio = make_audio(4000)
        wav = tmp_path / "u.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(audio.astype("<i2").tobytes())
        cfg = FeatureConfig.parse(cfg_mfcc_full())
        base = PhoneProbs(model, cfg, lna_bytes=2)
        fused = PhoneProbs(model, cfg, lna_bytes=2, fused=True)
        base.generate_to_file(str(wav), str(tmp_path / "b.lna"))
        fused.generate_to_file(str(wav), str(tmp_path / "f.lna"))
        lb, _ = read_lna(str(tmp_path / "b.lna"))
        lf, _ = read_lna(str(tmp_path / "f.lna"))
        assert lb.shape == lf.shape
        # compare in code units (1/1820 per code)
        np.testing.assert_allclose(lf, lb, atol=1.01 / 1820.0)

    def test_phone_probs_fused_rejects_clustering(self, tmp_path):
        from aaltoasr_tpu.models.phone_probs import PhoneProbs
        from aaltoasr_tpu.formats.feaconf import FeatureConfig
        from tests.test_gmm import random_model
        from tests.test_frontend import cfg_mfcc_full
        model = random_model(G=24, S=9, D=39, seed=8)
        pp = PhoneProbs(model, FeatureConfig.parse(cfg_mfcc_full()),
                        fused=True)
        gcl = tmp_path / "c.gcl"
        gcl.write_text("2\n" + "".join(
            f"{g} {g % 2}\n" for g in range(24)))
        with pytest.raises(ValueError):
            pp.read_clustering(str(gcl))

    def test_rejects_unsupported_models(self):
        model = _model()
        sc = GmmScorer.from_model(model)
        import dataclasses
        full = dataclasses.replace(sc, full_cov=True)
        with pytest.raises(ValueError):
            FusedGmmScorer.from_scorer(full)
