"""Adaptation tests: VTLN grid search, CMLLR solve, regression tree."""

import numpy as np
import pytest

import jax.numpy as jnp

from aaltoasr_tpu.formats.feaconf import FeatureConfig, ModuleConfig
from aaltoasr_tpu.frontend.generator import FeatureGenerator
from aaltoasr_tpu.models.hmm import (
    TransitionTable, build_chain, pad_chain)
from aaltoasr_tpu.ops.gmm import GmmScorer
from aaltoasr_tpu.train.mllr import CmllrEstimator, solve_cmllr
from aaltoasr_tpu.train.regtree import (
    build_regression_tree, read_regtree, terminal_classes, write_regtree)
from aaltoasr_tpu.train.vtln import VtlnEstimator, warp_grid

from tests.test_train import three_state_model


VTLN_CFG = """\
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
  name vtln
  type vtln
  sources fft
}
module
{
  name mel
  type mel
  sources fft
}
module
{
  name dct
  type dct
  sources mel
  dim 4
}
"""


class TestWarpGrid:
    def test_grid(self):
        g = warp_grid(1.0, 0.1, 21)
        assert len(g) == 21
        assert g[0] == pytest.approx(0.9)
        assert g[-1] == pytest.approx(1.1)
        assert g[10] == pytest.approx(1.0)


class TestVtln:
    def test_recovers_true_warp(self):
        """Features generated with warp w*; grid search must score w*
        (or a neighbor) best."""
        text = VTLN_CFG.replace("sources fft\n}\nmodule\n{\n  name mel\n"
                                "  type mel\n  sources fft",
                                "sources fft\n}\nmodule\n{\n  name mel\n"
                                "  type mel\n  sources vtln")
        cfg = FeatureConfig.parse(text)
        fg_gen = FeatureGenerator(cfg)
        rng = np.random.default_rng(0)
        n = 4000
        t = np.arange(n)
        audio = np.round(
            4000 * np.sin(2 * np.pi * 800 * t / 16000)
            + 2000 * np.sin(2 * np.pi * 2500 * t / 16000)
            + 100 * rng.standard_normal(n)).astype(np.float32)

        true_warp = 1.06
        pc = ModuleConfig()
        pc.set("warp_factor", true_warp)
        fg_gen.set_parameters("vtln", pc)
        feats = np.asarray(fg_gen.features(audio))

        # model trained on the warped features (single phone, 1 state)
        from aaltoasr_tpu.formats import model_io
        mean = feats.mean(0)
        var = np.maximum(feats.var(0), 0.05)
        model = model_io.HmmModel(
            dim=4, cov_type="diagonal_cov",
            means=mean[None, :], covars=var[None, :],
            mixtures=[(np.array([0], np.int32), np.array([1.0]))],
            phones=[model_io.HmmPhone("a", [0])],
            transitions={0: [(0, 0.9), (1, 0.1)]})
        table = TransitionTable.from_model(model)
        scorer = GmmScorer.from_model(model)

        fg = FeatureGenerator(FeatureConfig.parse(text))
        est = VtlnEstimator(model, table, scorer, fg, "vtln",
                            radius=0.1, size=11)
        warp, total, warps = est.estimate_speaker([(audio, ["a"])])
        assert abs(warp - true_warp) <= 0.021, (warp, total)


class TestCmllr:
    def test_solve_identity_when_matched(self):
        """Data = per-frame model means + unit noise: solve stays near
        identity (unit residual variance balances the log-det reward)."""
        rng = np.random.default_rng(1)
        D = 3
        T = 8000
        mu = rng.normal(0, 3, (T, D))        # per-frame model means
        X = mu + rng.normal(0, 1, (T, D))    # matched observations
        xi = np.concatenate([np.ones((T, 1)), X], axis=1)
        G = np.stack([xi.T @ xi for _ in range(D)])
        k = np.stack([xi.T @ mu[:, i] for i in range(D)])
        W = solve_cmllr(G, k, float(T))
        np.testing.assert_allclose(W[:, 1:], np.eye(D), atol=0.05)
        np.testing.assert_allclose(W[:, 0], 0, atol=0.08)

    def test_solve_recovers_affine_shift(self):
        """Observations shifted by +2 vs the means: transform shifts
        them back."""
        rng = np.random.default_rng(2)
        D = 2
        T = 8000
        mu = rng.normal(0, 3, (T, D))
        X = mu + 2.0 + rng.normal(0, 1, (T, D))
        xi = np.concatenate([np.ones((T, 1)), X], axis=1)
        G = np.stack([xi.T @ xi for _ in range(D)])
        k = np.stack([xi.T @ mu[:, i] for i in range(D)])
        W = solve_cmllr(G, k, float(T))
        np.testing.assert_allclose(W[:, 1:], np.eye(D), atol=0.1)
        np.testing.assert_allclose(W[:, 0], -2.0, atol=0.2)

    def test_estimator_improves_likelihood(self):
        model = three_state_model(seed=3)
        table = TransitionTable.from_model(model)
        scorer = GmmScorer.from_model(model)
        rng = np.random.default_rng(4)
        # sample data from the model then shift features
        T = 200
        states = np.repeat([0, 1, 2], T // 3 + 1)[:T]
        X = np.zeros((T, model.dim), dtype=np.float32)
        for t, s in enumerate(states):
            idx, w = model.mixtures[s]
            g = idx[rng.choice(len(idx), p=w)]
            X[t] = rng.normal(model.means[g], np.sqrt(model.covars[g]))
        X_shift = X + 1.5

        chain = build_chain(model, table, ["a", "_"])
        graph = {k2: jnp.asarray(v) for k2, v in
                 pad_chain(chain, chain.num_positions).items()}
        classes = np.zeros(scorer.score_matrix.shape[1], dtype=np.int32)
        est = CmllrEstimator(scorer, table, classes, 1,
                             model.means, model.covars)
        est.accumulate(X_shift, graph, T)
        ll_before = float(est._acc["ll"])
        W = est.transforms(min_frames=10)[0]
        X_adapted = X_shift @ W[:, 1:].T + W[:, 0]
        est2 = CmllrEstimator(scorer, table, classes, 1,
                              model.means, model.covars)
        est2.accumulate(X_adapted.astype(np.float32), graph, T)
        ll_after = float(est2._acc["ll"])
        assert ll_after > ll_before + 10


class TestRegTree:
    def test_splits_two_clusters(self):
        rng = np.random.default_rng(5)
        means = np.concatenate([
            rng.normal(-5, 0.5, (20, 3)), rng.normal(5, 0.5, (20, 3))])
        root = build_regression_tree(means, num_terminals=2,
                                     min_gaussians=4)
        classes = terminal_classes(root, 40)
        assert len(np.unique(classes)) == 2
        # the two natural clusters must not be mixed
        assert len(np.unique(classes[:20])) == 1
        assert len(np.unique(classes[20:])) == 1
        assert classes[0] != classes[39]

    def test_file_round_trip(self, tmp_path):
        rng = np.random.default_rng(6)
        means = rng.normal(0, 3, (32, 4))
        root = build_regression_tree(means, num_terminals=4,
                                     min_gaussians=2)
        p = tmp_path / "tree"
        write_regtree(root, str(p))
        classes = terminal_classes(root, 32)
        loaded = read_regtree(str(p), 32)
        # same partition (up to label permutation)
        for c in np.unique(classes):
            members = classes == c
            assert len(np.unique(loaded[members])) == 1


class TestModelSpaceCmllr:
    def test_equivalence_with_feature_transform(self):
        """Scoring the rewritten (full-cov) model on x equals scoring
        the original on A_c x + b_c plus log|det A_c|, per class."""
        import jax.numpy as jnp
        from aaltoasr_tpu.ops.gmm import GmmScorer
        from aaltoasr_tpu.train.mllr import apply_model_cmllr
        from tests.test_gmm import random_model
        rng = np.random.default_rng(0)
        model = random_model(G=8, S=3, D=4, K=2, seed=1)
        D = model.dim
        Ws = []
        for c in range(2):
            A = np.eye(D) + 0.15 * rng.normal(0, 1, (D, D))
            b = rng.normal(0, 0.5, D)
            Ws.append(np.concatenate([b[:, None], A], axis=1))
        cls = np.array([0, 0, 0, 1, 1, 1, 0, 1])
        adapted = apply_model_cmllr(model, Ws, cls)
        sa = GmmScorer.from_model(adapted)
        so = GmmScorer.from_model(model)
        X = rng.normal(0, 1, (6, D)).astype(np.float32)
        got = np.asarray(sa.gaussian_log_likelihoods(jnp.asarray(X)))
        for c, W in enumerate(Ws):
            A, b = W[:, 1:], W[:, 0]
            Xc = (X @ A.T + b).astype(np.float32)
            want = (np.asarray(so.gaussian_log_likelihoods(
                jnp.asarray(Xc)))
                + np.log(abs(np.linalg.det(A))))
            for g in np.nonzero(cls == c)[0]:
                np.testing.assert_allclose(got[:, g], want[:, g],
                                           rtol=2e-3, atol=2e-3)
