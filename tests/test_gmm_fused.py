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

    def test_rejects_unsupported_models(self):
        model = _model()
        sc = GmmScorer.from_model(model)
        import dataclasses
        full = dataclasses.replace(sc, full_cov=True)
        with pytest.raises(ValueError):
            FusedGmmScorer.from_scorer(full)
