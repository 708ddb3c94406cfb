"""optmodel / L-BFGS optimization tests."""

import numpy as np
import pytest

from aaltoasr_tpu.models.hmm import TransitionTable
from aaltoasr_tpu.train.accumulators import (
    HmmStats, ML_BUF, PDF_ML_STATS)
from aaltoasr_tpu.train.optimize import (
    LbfgsState, criterion_grad, optimization_step, pack_params,
    unpack_params)

from tests.test_gmm import random_model


def fill_random_stats(stats, model, seed, buf=ML_BUF):
    rng = np.random.default_rng(seed)
    G, D = model.means.shape
    b = stats.buffers[buf]
    b.gamma[:G] = rng.uniform(1, 10, G)
    b.mean_acc[:G] = (b.gamma[:G, None]
                      * rng.normal(0, 1, (G, D)))
    b.sec_acc[:G] = (b.gamma[:G, None]
                     * rng.uniform(0.5, 3.0, (G, D))
                     + b.mean_acc[:G] ** 2 / b.gamma[:G, None])
    for s, (idx, w) in enumerate(model.mixtures):
        b.mix_gamma[s, :len(w)] = rng.uniform(0.5, 5, len(w))


class TestGradient:
    def test_matches_autodiff(self):
        """criterion_grad == jax.grad of the explicit sufficient-
        statistics objective in the same packed space."""
        import jax
        import jax.numpy as jnp
        model = random_model(G=6, S=2, D=3, K=3, seed=0)
        table = TransitionTable.from_model(model)
        stats = HmmStats.zeros(model, table, PDF_ML_STATS)
        fill_random_stats(stats, model, 1)
        b = stats.buffers[ML_BUF]
        G, D = model.means.shape

        sizes = [len(w) for _, w in model.mixtures]

        def objective(x):
            mu = x[:G * D].reshape(G, D)
            logv = x[G * D:2 * G * D].reshape(G, D)
            p = jnp.exp(-logv)
            gam = jnp.asarray(b.gamma[:G])[:, None]
            m1 = jnp.asarray(b.mean_acc[:G])
            m2 = jnp.asarray(b.sec_acc[:G])
            F = jnp.sum(-0.5 * gam * logv
                        - 0.5 * (m2 - 2 * mu * m1 + gam * mu * mu) * p)
            off = 2 * G * D
            for s, k in enumerate(sizes):
                logits = x[off:off + k]
                off += k
                logw = logits - jax.scipy.special.logsumexp(logits)
                F = F + jnp.sum(jnp.asarray(b.mix_gamma[s, :k]) * logw)
            return F

        x0 = pack_params(model)
        jax.config.update("jax_enable_x64", True)
        try:
            want = np.asarray(jax.grad(objective)(jnp.asarray(x0)))
        finally:
            jax.config.update("jax_enable_x64", False)
        got = criterion_grad(model, stats, ml_weight=1.0)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)

    def test_pack_roundtrip(self):
        model = random_model(G=5, S=2, D=4, K=2, seed=2)
        m2 = unpack_params(model, pack_params(model), minvar=1e-8)
        np.testing.assert_allclose(m2.means, model.means, atol=1e-12)
        np.testing.assert_allclose(m2.covars, model.covars, rtol=1e-9)
        for (i1, w1), (i2, w2) in zip(model.mixtures, m2.mixtures):
            np.testing.assert_allclose(w2, w1, rtol=1e-9)


class TestLbfgs:
    def test_quadratic_convergence_with_state_roundtrip(self, tmp_path):
        """Maximize -0.5 x'Ax + b'x across invocations with the state
        file persisted each step (the optmodel iteration pattern)."""
        rng = np.random.default_rng(3)
        n = 12
        Q = rng.normal(0, 1, (n, n))
        A = Q @ Q.T + np.eye(n)
        bvec = rng.normal(0, 1, n)
        x_star = np.linalg.solve(A, bvec)

        path = str(tmp_path / "osf.npz")
        x = np.zeros(n)
        LbfgsState(max_updates=6, init_scale=0.1).save(path)
        for it in range(40):
            grad = bvec - A @ x
            state = LbfgsState.load(path)
            x = optimization_step(x, grad, state, limit=10.0)
            state.save(path)
        assert np.linalg.norm(x - x_star) < 1e-4

    def test_limit_clips_step(self):
        state = LbfgsState(init_scale=1.0)
        x = np.zeros(4)
        grad = np.array([100.0, -50.0, 0.0, 1.0])
        x2 = optimization_step(x, grad, state, limit=0.5)
        assert np.abs(x2).max() == pytest.approx(0.5, abs=1e-9)


class TestOptmodelCli:
    def test_iteration(self, tmp_path):
        from aaltoasr_tpu.cli.optmodel import main
        from aaltoasr_tpu.formats import model_io
        model = random_model(G=6, S=2, D=3, K=3, seed=4)
        table = TransitionTable.from_model(model)
        model_io.write_model(str(tmp_path / "m0"), model)
        stats = HmmStats.zeros(model, table, PDF_ML_STATS)
        fill_random_stats(stats, model, 5)
        stats.num_ll = -1234.0
        stats.num_frames = 100
        stats.dump(str(tmp_path / "s0"))
        (tmp_path / "stats.lst").write_text("%s\n"
                                            % (tmp_path / "s0"))
        rc = main(["-b", str(tmp_path / "m0"),
                   "-L", str(tmp_path / "stats.lst"),
                   "-F", str(tmp_path / "opt.osf.npz"),
                   "-o", str(tmp_path / "m1"), "--ml", "1.0",
                   "--limit", "0.1",
                   "-s", str(tmp_path / "sum")])
        assert rc == 0
        m1 = model_io.read_model(str(tmp_path / "m1"))
        assert np.abs(m1.means - model.means).max() > 1e-4
        assert np.abs(m1.means - model.means).max() <= 0.1 + 1e-6
        # second iteration consumes the state file
        rc = main(["-b", str(tmp_path / "m1"),
                   "-L", str(tmp_path / "stats.lst"),
                   "-F", str(tmp_path / "opt.osf.npz"),
                   "-o", str(tmp_path / "m2"), "--ml", "1.0",
                   "--limit", "0.1"])
        assert rc == 0
        st = LbfgsState.load(str(tmp_path / "opt.osf.npz"))
        assert len(st.s) >= 1    # curvature pair recorded

    def test_requires_criterion(self, tmp_path, capsys):
        from aaltoasr_tpu.cli.optmodel import main
        from aaltoasr_tpu.formats import model_io
        model = random_model(G=4, S=2, D=3, K=2, seed=6)
        model_io.write_model(str(tmp_path / "m"), model)
        (tmp_path / "l").write_text("")
        assert main(["-b", str(tmp_path / "m"), "-L",
                     str(tmp_path / "l"),
                     "-F", str(tmp_path / "o"), "-o",
                     str(tmp_path / "x")]) == 1
