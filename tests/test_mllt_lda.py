"""MLLT and LDA estimation tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from aaltoasr_tpu.models.hmm import TransitionTable, build_chain, pad_chain
from aaltoasr_tpu.ops.gmm import GmmScorer
from aaltoasr_tpu.train.lda import LdaAccumulator
from aaltoasr_tpu.train.mllt import (
    apply_mllt, full_second_moment_stats, solve_mllt)

from tests.test_train import three_state_model


class TestMllt:
    def test_identity_when_already_diagonal(self):
        """Gaussians with diagonal covariance: MLLT stays near identity
        (up to row sign/permutation; check off-diagonal energy)."""
        rng = np.random.default_rng(0)
        G, D = 6, 4
        gamma = np.full(G, 200.0)
        mu = rng.normal(0, 2, (G, D))
        var = rng.uniform(0.5, 2, (G, D))
        m1 = mu * gamma[:, None]
        m2 = np.stack([np.diag(var[g]) * gamma[g]
                       + gamma[g] * np.outer(mu[g], mu[g])
                       for g in range(G)])
        A = solve_mllt(gamma, m1, m2, iters=5)
        off = np.abs(A - np.diag(np.diag(A))).sum()
        assert off < 0.35 * np.abs(np.diag(A)).sum()

    def test_decorrelates_shared_rotation(self):
        """All Gaussians share one rotation of a diagonal covariance:
        MLLT must (nearly) undo it — off-diagonal mass of A Sigma A^T
        shrinks by a large factor."""
        rng = np.random.default_rng(1)
        D, G = 3, 8
        theta = 0.7
        R = np.eye(D)
        R[:2, :2] = [[np.cos(theta), -np.sin(theta)],
                     [np.sin(theta), np.cos(theta)]]
        gamma = np.full(G, 500.0)
        mu = rng.normal(0, 1, (G, D))
        sigmas = [R @ np.diag(rng.uniform(0.5, 4, D)) @ R.T
                  for _ in range(G)]
        m1 = mu * gamma[:, None]
        m2 = np.stack([gamma[g] * (sigmas[g] + np.outer(mu[g], mu[g]))
                       for g in range(G)])
        A = solve_mllt(gamma, m1, m2, iters=15)

        def offdiag_mass(M):
            S = np.einsum("ij,gjk,lk->gil", M, np.stack(sigmas), M)
            d = np.einsum("gii->gi", S)
            return (np.abs(S).sum() - np.abs(d).sum()) / np.abs(d).sum()

        assert offdiag_mass(A) < 0.25 * offdiag_mass(np.eye(D))

    def test_full_stats_device_matches_numpy(self):
        model = three_state_model()
        table = TransitionTable.from_model(model)
        scorer = GmmScorer.from_model(model)
        rng = np.random.default_rng(2)
        T = 16
        X = rng.normal(0, 2, (T, model.dim)).astype(np.float32)
        chain = build_chain(model, table, ["a", "_"])
        graph = {k: jnp.asarray(v) for k, v in
                 pad_chain(chain, chain.num_positions).items()}
        out = full_second_moment_stats(
            scorer, jnp.asarray(X), graph, jnp.int32(T),
            model.num_gaussians)
        g = np.asarray(out["gamma"])
        m2 = np.asarray(out["m2_full"])
        # diagonal of the full moment equals the E-step diagonal stats
        from aaltoasr_tpu.train import estep
        st = estep.chain_stats(scorer, jnp.asarray(X), graph,
                               jnp.int32(T), table.num_slots)
        np.testing.assert_allclose(
            np.einsum("gii->gi", m2)[:6],
            np.asarray(st["sec_acc"])[:6], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(g[:6], np.asarray(st["gamma"])[:6],
                                   rtol=1e-4, atol=1e-4)
        # symmetry
        np.testing.assert_allclose(m2, np.swapaxes(m2, 1, 2),
                                   rtol=1e-4, atol=1e-4)

    def test_apply_mllt_transforms_model(self):
        model = three_state_model()
        A = np.diag([2.0, 1.0, 0.5, 1.0])
        out = apply_mllt(model, A)
        np.testing.assert_allclose(out.means[:, 0],
                                   2 * model.means[:, 0])
        np.testing.assert_allclose(out.covars[:, 2],
                                   0.25 * model.covars[:, 2])


class TestLda:
    def test_separates_classes(self):
        """Two classes separated along one axis with noise elsewhere:
        the top LDA direction must align with the separating axis."""
        rng = np.random.default_rng(3)
        acc = LdaAccumulator(2, 4)
        n = 500
        x0 = rng.normal(0, 1, (n, 4))
        x0[:, 2] -= 4
        x1 = rng.normal(0, 1, (n, 4))
        x1[:, 2] += 4
        acc.add(0, x0)
        acc.add(1, x1)
        W = acc.solve(1)
        direction = np.abs(W[0]) / np.linalg.norm(W[0])
        assert direction[2] > 0.95
