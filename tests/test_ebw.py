"""Discriminative training tests: EBW updates and the MMI pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

from aaltoasr_tpu.models.hmm import TransitionTable
from aaltoasr_tpu.models.hmmnet import (
    compile_hmmnet, pad_hmmnet, transcript_hmmnet)
from aaltoasr_tpu.ops.gmm import GmmScorer
from aaltoasr_tpu.train import estep
from aaltoasr_tpu.train.ebw import (
    ebw_gaussian_update, ebw_min_d, estimate_mmi, mmi_mixture_weights)
from aaltoasr_tpu.train.accumulators import (
    HmmStats, ML_BUF, MMI_BUF, PDF_ML_STATS, PDF_MMI_STATS)
from aaltoasr_tpu.train.driver import device_stats_to_hmm_stats

from tests.test_train import three_state_model


class TestEbwGaussian:
    def test_update_moves_toward_num(self):
        """With much more numerator than denominator mass centered apart,
        the mean moves toward the numerator data."""
        G, D = 2, 3
        old_means = np.zeros((G, D))
        old_covars = np.ones((G, D))
        num_gamma = np.array([100.0, 50.0])
        num_m1 = np.array([[100.0, 0, 0], [0, 50.0, 0]])   # mean 1 / dim0
        num_m2 = num_m1 * 1.0 + num_gamma[:, None]         # E[x^2]=mu^2+1
        num_m2 = np.array([[200.0, 100, 100], [50, 100.0, 50]])
        den_gamma = np.array([10.0, 5.0])
        den_m1 = np.array([[-10.0, 0, 0], [0, -5.0, 0]])
        den_m2 = np.array([[20.0, 10, 10], [5, 10.0, 5]])
        means, covars, d, _mind = ebw_gaussian_update(
            old_means, old_covars, num_gamma, num_m1, num_m2,
            den_gamma, den_m1, den_m2, minvar=0.01)
        assert means[0, 0] > 0.5           # pulled toward num (+1)
        assert means[1, 1] > 0.4
        assert np.all(covars > 0)

    def test_min_d_keeps_variance_positive(self):
        rng = np.random.default_rng(0)
        G, D = 8, 5
        old_means = rng.normal(0, 1, (G, D))
        old_covars = rng.uniform(0.5, 2, (G, D))
        num_gamma = rng.uniform(1, 20, G)
        den_gamma = rng.uniform(10, 40, G)   # strong denominator
        num_m1 = old_means * num_gamma[:, None]
        num_m2 = (old_covars + old_means ** 2) * num_gamma[:, None]
        den_m1 = rng.normal(0, 5, (G, D)) * den_gamma[:, None]
        den_m2 = rng.uniform(1, 20, (G, D)) * den_gamma[:, None]
        means, covars, d, _mind = ebw_gaussian_update(
            old_means, old_covars, num_gamma, num_m1, num_m2,
            den_gamma, den_m1, den_m2, minvar=1e-4)
        assert np.all(covars >= 1e-4)
        assert np.all(np.isfinite(means))

    def test_large_d_stays_near_old(self):
        G, D = 1, 2
        means, covars, _, _mind = ebw_gaussian_update(
            np.ones((G, D)), np.ones((G, D)),
            np.array([1.0]), np.ones((G, D)), 2 * np.ones((G, D)),
            np.array([0.0]), np.zeros((G, D)), np.zeros((G, D)),
            tau=1e6, minvar=0.01)
        np.testing.assert_allclose(means, 1.0, atol=1e-3)


class TestMmiWeights:
    def test_single_component(self):
        w = mmi_mixture_weights(np.array([5.0]), np.array([2.0]),
                                np.array([1.0]))
        assert w[0] == 1.0

    def test_moves_toward_num_dominant(self):
        old = np.array([0.5, 0.5])
        num = np.array([80.0, 20.0])
        den = np.array([20.0, 40.0])
        w = mmi_mixture_weights(num, den, old)
        assert w[0] > 0.5
        assert w.sum() == pytest.approx(1.0, abs=1e-6)

    def test_symmetric_denominator_degenerates_to_noop(self):
        # a == 0 makes the quadratic linear; the reference computes nan
        # and skips the update (Distributions.cc:2371) — parity behavior
        old = np.array([0.5, 0.5])
        w = mmi_mixture_weights(np.array([80.0, 20.0]),
                                np.array([30.0, 30.0]), old)
        np.testing.assert_allclose(w, old)

    def test_objective_does_not_decrease(self):
        rng = np.random.default_rng(1)
        for _ in range(5):
            K = 4
            old = rng.dirichlet(np.ones(K))
            num = rng.uniform(0, 50, K)
            den = rng.uniform(0, 50, K)
            w = mmi_mixture_weights(num, den, old)
            f_old = np.sum(num * np.log(old) - den)
            f_new = np.sum(num * np.log(w) - den * w / old)
            assert f_new >= f_old - 1e-6


class TestMmiPipeline:
    def test_mmi_objective_improves(self):
        """num = correct transcript, den = competing transcript union;
        one EBW step must raise num_ll - den_ll."""
        model = three_state_model(seed=20)
        table = TransitionTable.from_model(model)
        scorer = GmmScorer.from_model(model)
        rng = np.random.default_rng(21)

        # data from transcript ["a", "_"]
        T = 60
        states = np.concatenate([
            np.repeat([0, 1], T // 3), np.repeat(2, T - 2 * (T // 3))])
        X = np.zeros((T, model.dim), dtype=np.float32)
        for t, s in enumerate(states):
            idx, w = model.mixtures[s]
            g = idx[rng.choice(len(idx), p=w)]
            X[t] = rng.normal(model.means[g], np.sqrt(model.covars[g]))

        def graphs_for(m):
            tb = TransitionTable.from_model(m)
            num_fst = transcript_hmmnet(m, tb, ["a", "_"],
                                        optional_silence="")
            # denominator: free loop over both words approximated by the
            # union of two transcripts via optional silence everywhere
            den_fst = transcript_hmmnet(m, tb, ["_", "a"],
                                        optional_silence="_")
            gn, _ = compile_hmmnet(num_fst, tb)
            gd, _ = compile_hmmnet(den_fst, tb)
            pad = max(int(gn["num_positions"]), int(gd["num_positions"]))
            fan = max(gn["in_src"].shape[1], gd["in_src"].shape[1])
            return (
                {k: jnp.asarray(v) for k, v in
                 pad_hmmnet(gn, pad, fan).items()},
                {k: jnp.asarray(v) for k, v in
                 pad_hmmnet(gd, pad, fan).items()},
                tb)

        def mmi_objective(m):
            sc = GmmScorer.from_model(m)
            gn, gd, tb = graphs_for(m)
            sn = estep.chain_stats(sc, jnp.asarray(X), gn, jnp.int32(T),
                                   tb.num_slots)
            sd = estep.chain_stats(sc, jnp.asarray(X), gd, jnp.int32(T),
                                   tb.num_slots)
            return (float(sn["log_likelihood"])
                    - float(sd["log_likelihood"]), sn, sd)

        obj0, sn, sd = mmi_objective(model)
        stats = HmmStats.zeros(model, table,
                               PDF_ML_STATS | PDF_MMI_STATS)
        device_stats_to_hmm_stats(model, table, sn,
                                  PDF_ML_STATS | PDF_MMI_STATS,
                                  ML_BUF, stats)
        device_stats_to_hmm_stats(model, table, sd,
                                  PDF_ML_STATS | PDF_MMI_STATS,
                                  MMI_BUF, stats)
        new_model = estimate_mmi(model, table, stats, minvar=0.01)
        obj1, _, _ = mmi_objective(new_model)
        assert obj1 > obj0


class TestConstrainedEbw:
    def test_kld_limit_shrinks_step(self):
        """With a KLD budget the update moves less, and the realized
        change respects max(mean_kld, cov_kld) <= limit."""
        from aaltoasr_tpu.train.ebw import (
            _ebw_solution, ebw_constrained_d, ebw_gaussian_update)
        rng = np.random.default_rng(0)
        G, D = 6, 4
        mu = rng.normal(0, 1, (G, D))
        cov = np.full((G, D), 1.0)
        ng = np.full(G, 20.0)
        nm1 = (mu + 1.5) * ng[:, None]          # pull means up hard
        nm2 = (cov + (mu + 1.5) ** 2) * ng[:, None]
        dg = np.full(G, 5.0)
        dm1 = mu * dg[:, None]
        dm2 = (cov + mu ** 2) * dg[:, None]

        m_free, c_free, d_free, _ = ebw_gaussian_update(
            mu, cov, ng, nm1, nm2, dg, dm1, dm2, minvar=1e-4)
        limit = 0.05
        m_lim, c_lim, d_lim, _ = ebw_gaussian_update(
            mu, cov, ng, nm1, nm2, dg, dm1, dm2, minvar=1e-4,
            max_kld=limit)
        # step strictly smaller
        assert (np.abs(m_lim - mu).sum()
                < np.abs(m_free - mu).sum())
        assert (d_lim >= d_free - 1e-9).all()
        # realized KLD at the chosen D within budget (small tolerance
        # for the bisection)
        km = 0.5 * (((m_lim - mu) ** 2) / cov).sum(axis=1)
        kc = 0.5 * ((np.maximum(c_lim, 1e-10) / cov
                     + np.log(cov / np.maximum(c_lim, 1e-10))
                     ).sum(axis=1) - D)
        assert (np.maximum(km, kc) <= limit * 1.05 + 1e-6).all()

    def test_no_op_when_within_budget(self):
        from aaltoasr_tpu.train.ebw import ebw_gaussian_update
        rng = np.random.default_rng(1)
        G, D = 4, 3
        mu = rng.normal(0, 1, (G, D))
        cov = np.ones((G, D))
        ng = np.full(G, 10.0)
        nm1 = (mu + 0.001) * ng[:, None]
        nm2 = (cov + (mu + 0.001) ** 2) * ng[:, None]
        dg = np.full(G, 2.0)
        dm1 = mu * dg[:, None]
        dm2 = (cov + mu ** 2) * dg[:, None]
        a = ebw_gaussian_update(mu, cov, ng, nm1, nm2, dg, dm1, dm2)
        b = ebw_gaussian_update(mu, cov, ng, nm1, nm2, dg, dm1, dm2,
                                max_kld=100.0)
        np.testing.assert_allclose(a[0], b[0])
        np.testing.assert_allclose(a[2], b[2])
