"""GMM scoring vs a double-precision oracle of the reference semantics."""

import numpy as np

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.ops.gmm import GmmScorer, quantize_lna_u16
from aaltoasr_tpu.ops.logsemiring import SAFE_LOG_FLOOR


def random_model(G=40, S=11, D=13, K=4, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(0, 2, (G, D))
    covars = rng.uniform(0.3, 3.0, (G, D))
    mixtures = []
    for s in range(S):
        k = rng.integers(1, K + 1)
        idx = rng.choice(G, size=k, replace=False).astype(np.int32)
        w = rng.dirichlet(np.ones(k))
        mixtures.append((idx, w))
    return model_io.HmmModel(
        dim=D, cov_type="diagonal_cov", means=means, covars=covars,
        mixtures=mixtures, phones=[], transitions={})


def oracle_state_ll(model, x):
    """Reference math in float64: scalar Gaussian loops + linear mixture sum
    (`aku/Distributions.cc:1034-1060, 2079-2086`; safe_log util.hh:133)."""
    G = model.num_gaussians
    prec = 1.0 / model.covars
    const = np.log(np.sqrt(np.prod(prec, axis=1)))
    gll = np.zeros(G)
    for g in range(G):
        d = x - model.means[g]
        gll[g] = -0.5 * np.sum(d * d * prec[g]) + const[g]
    out = np.zeros(len(model.mixtures))
    for s, (idx, w) in enumerate(model.mixtures):
        lik = np.sum(w * np.exp(gll[idx]))
        out[s] = np.log(max(lik, 1e-50))
    return out


class TestGmmScorer:
    def test_state_ll_matches_oracle(self):
        model = random_model()
        scorer = GmmScorer.from_model(model)
        rng = np.random.default_rng(1)
        X = rng.normal(0, 2, (7, model.dim)).astype(np.float32)
        got = np.asarray(scorer.state_log_likelihoods(X))[:, :model.num_states]
        want = np.stack([oracle_state_ll(model, x) for x in X])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_lna_normalization_matches_reference(self):
        # PPToolbox: lp_i = safe_log(lik_i / sum_j lik_j)
        model = random_model(seed=2)
        scorer = GmmScorer.from_model(model)
        rng = np.random.default_rng(3)
        X = rng.normal(0, 2, (5, model.dim)).astype(np.float32)
        got = np.asarray(scorer.lna_log_probs(X))
        for t in range(5):
            sll = oracle_state_ll(model, X[t])
            lik = np.exp(sll)
            want = np.log(np.maximum(lik / lik.sum(), 1e-50))
            np.testing.assert_allclose(got[t], want, rtol=1e-3, atol=2e-4)
        # normalized: logsumexp over states == 0
        np.testing.assert_allclose(
            np.log(np.sum(np.exp(got), axis=1)), 0.0, atol=1e-4)

    def test_quantize_matches_host_codec(self):
        from aaltoasr_tpu.formats.lna import quantize_lna
        rng = np.random.default_rng(4)
        lp = -rng.uniform(0, 40, (6, 9)).astype(np.float32)
        dev = np.asarray(quantize_lna_u16(lp))
        host = np.frombuffer(quantize_lna(lp, 2), dtype=">u2").reshape(6, 9)
        np.testing.assert_array_equal(dev, host)

    def test_floor_applied(self):
        model = random_model(seed=5)
        scorer = GmmScorer.from_model(model)
        # a far-away frame: every state essentially zero except the argmax
        x = np.full((1, model.dim), 50.0, dtype=np.float32)
        lp = np.asarray(scorer.lna_log_probs(x))
        assert lp.min() >= SAFE_LOG_FLOOR - 1e-5
        assert np.isfinite(lp).all()

    def test_padding_does_not_change_scores(self):
        model = random_model(G=33, S=7, seed=6)  # awkward sizes -> padding
        scorer = GmmScorer.from_model(model)
        assert scorer.score_matrix.shape[1] % 128 == 0
        rng = np.random.default_rng(7)
        X = rng.normal(0, 1, (3, model.dim)).astype(np.float32)
        got = np.asarray(scorer.state_log_likelihoods(X))[:, :model.num_states]
        want = np.stack([oracle_state_ll(model, x) for x in X])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestPhoneProbsPipeline:
    def test_end_to_end_lna(self, tmp_path):
        """WAV -> LNA through the full pipeline; decode and sanity-check."""
        import wave
        from aaltoasr_tpu.models.phone_probs import PhoneProbs
        from aaltoasr_tpu.formats.lna import read_lna
        from tests.test_frontend import cfg_mfcc_full, make_audio
        from aaltoasr_tpu.formats.feaconf import FeatureConfig

        # model with dim 39 to match the MFCC config
        model = random_model(G=24, S=9, D=39, seed=8)
        audio = make_audio(4000)
        wav = tmp_path / "u.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(audio.astype("<i2").tobytes())

        pp = PhoneProbs(model, FeatureConfig.parse(cfg_mfcc_full()),
                        lna_bytes=2)
        out = tmp_path / "u.lna"
        frames = pp.generate_to_file(str(wav), str(out))
        lp, nbytes = read_lna(str(out))
        assert nbytes == 2
        assert lp.shape == (frames, 9)
        assert frames == pp.fg.num_frames(4000)
        # decoded log-probs are normalized-ish (quantization + floor)
        sums = np.sum(np.exp(lp), axis=1)
        assert np.all(sums > 0.8) and np.all(sums < 1.2)

    def test_dim_mismatch_raises(self):
        from aaltoasr_tpu.models.phone_probs import PhoneProbs
        from aaltoasr_tpu.formats.feaconf import FeatureConfig
        from tests.test_frontend import cfg_mfcc_full
        import pytest
        model = random_model(D=10)
        with pytest.raises(ValueError):
            PhoneProbs(model, FeatureConfig.parse(cfg_mfcc_full()))


class TestFullCovariance:
    def _full_model(self, seed=0, D=5, G=6):
        rng = np.random.default_rng(seed)
        means = rng.normal(0, 1, (G, D))
        covars = np.ones((G, D))
        full = {}
        kinds = []
        for g in range(G):
            if g % 2 == 0:
                L = rng.normal(0, 0.4, (D, D))
                full[g] = L @ L.T + np.eye(D)
                kinds.append("full")
            else:
                covars[g] = rng.uniform(0.5, 2.0, D)
                kinds.append("diag")
        mixtures = [(np.arange(G, dtype=np.int32),
                     np.full(G, 1.0 / G))]
        model = model_io.HmmModel(
            dim=D, cov_type="variable", means=means, covars=covars,
            mixtures=mixtures,
            phones=[model_io.HmmPhone("a", [0])],
            transitions={0: [(0, .5), (1, .5)]},
            full_covars=full, gauss_kind=kinds)
        return model

    def test_matches_quadratic_form(self):
        """Scorer's single-matmul path == per-Gaussian quadratic form
        C - (x-mu)'P(x-mu)/2 (Distributions.cc:1413-1426)."""
        model = self._full_model()
        sc = GmmScorer.from_model(model)
        assert sc.full_cov
        rng = np.random.default_rng(1)
        X = rng.normal(0, 1, (7, model.dim)).astype(np.float32)
        got = np.asarray(sc.gaussian_log_likelihoods(X))
        prec_diag = model.precisions()
        for g in range(6):
            if g in model.full_covars:
                P = np.linalg.inv(model.full_covars[g])
                C = 0.5 * np.linalg.slogdet(P)[1]
            else:
                P = np.diag(prec_diag[g])
                C = 0.5 * np.log(np.prod(prec_diag[g]))
            for t in range(7):
                d = X[t] - model.means[g]
                want = C - 0.5 * d @ P @ d
                np.testing.assert_allclose(got[t, g], want,
                                           rtol=2e-4, atol=2e-4)

    def test_diag_embedding_matches_diag_path(self):
        """A variable model whose Gaussians are all diagonal scores
        identically through both code paths."""
        model = random_model(G=8, S=3, D=6, K=2, seed=3)
        diag = GmmScorer.from_model(model)
        model.cov_type = "variable"
        model.gauss_kind = ["diag"] * 8
        # force the full path without any full Gaussians registered
        model.gauss_kind[0] = "full"
        model.full_covars = {0: np.diag(model.covars[0])}
        full = GmmScorer.from_model(model)
        assert full.full_cov and not diag.full_cov
        rng = np.random.default_rng(4)
        X = rng.normal(0, 1, (5, 6)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(full.gaussian_log_likelihoods(X))[:, :8],
            np.asarray(diag.gaussian_log_likelihoods(X))[:, :8],
            rtol=2e-4, atol=2e-4)

    def test_non_spd_scores_zero(self):
        """Non-SPD covariance -> zero precision and constant
        (set_covariance invalid-parameters branch)."""
        model = self._full_model()
        model.full_covars[0] = -np.eye(model.dim)
        sc = GmmScorer.from_model(model)
        X = np.random.default_rng(2).normal(
            0, 1, (3, model.dim)).astype(np.float32)
        got = np.asarray(sc.gaussian_log_likelihoods(X))
        np.testing.assert_allclose(got[:, 0], 0.0, atol=1e-5)


class TestClusterGating:
    def test_gated_semantics(self):
        """Selected clusters score exactly; the rest inherit their
        center's likelihood (Distributions.cc:2684-2722)."""
        import jax.numpy as jnp
        from aaltoasr_tpu.train.gcluster import cluster_gaussians
        model = random_model(G=16, S=5, D=6, K=3, seed=7)
        assign = cluster_gaussians(model.means, 4)
        sc = GmmScorer.from_model(model)
        gated_sc = sc.with_clustering(model, assign, 4, eval_minc=0.0,
                                      eval_ming=0.25)
        rng = np.random.default_rng(8)
        X = jnp.asarray(rng.normal(0, 1, (5, 6)).astype(np.float32))
        exact = np.asarray(sc.gaussian_log_likelihoods(X))
        gated = np.asarray(gated_sc.gated_gaussian_log_likelihoods(X))
        cll_cols = np.asarray(gated_sc.cluster_of)[:16]
        for t in range(5):
            for g in range(16):
                v = gated[t, g]
                # either the exact value or a shared per-cluster value
                same_cluster = [gated[t, h] for h in range(16)
                                if cll_cols[h] == cll_cols[g]]
                assert (np.isclose(v, exact[t, g], atol=1e-4)
                        or np.allclose(same_cluster, v, atol=1e-4))
        # at least min_eval_gauss Gaussians exact per frame
        exact_hits = np.isclose(gated[:, :16], exact[:, :16],
                                atol=1e-4).sum(axis=1)
        assert (exact_hits >= gated_sc.min_eval_gauss).all()

    def test_full_eval_ratio_recovers_exact(self):
        """eval_ming=1.0 selects every cluster: gated == dense."""
        import jax.numpy as jnp
        from aaltoasr_tpu.train.gcluster import cluster_gaussians
        model = random_model(G=12, S=4, D=5, K=2, seed=9)
        assign = cluster_gaussians(model.means, 3)
        sc = GmmScorer.from_model(model)
        g2 = sc.with_clustering(model, assign, 3, eval_ming=1.0)
        X = jnp.asarray(np.random.default_rng(1).normal(
            0, 1, (4, 5)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(g2.state_log_likelihoods(X)),
            np.asarray(sc.state_log_likelihoods(X)), atol=1e-4)
