"""clsstep: constrained-line-search update (aku/clsstep.cc)."""

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.models.hmm import TransitionTable
from aaltoasr_tpu.train import clsstep, clsstep_kld
from aaltoasr_tpu.train.accumulators import (
    HmmStats, ML_BUF, MMI_BUF, PDF_ML_STATS, PDF_MMI_STATS)

from tests.test_train import three_state_model


def mmi_stats(model, table, seed=1, num_scale=3.0):
    """MMI-shaped stats: num (ML buffer) pulls somewhere, den (MMI
    buffer) pushes elsewhere; num dominates so criterion gammas > 0."""
    rng = np.random.default_rng(seed)
    G, D = model.means.shape
    stats = HmmStats.zeros(model, table, PDF_ML_STATS | PDF_MMI_STATS)
    for buf_id, scale in ((ML_BUF, num_scale), (MMI_BUF, 1.0)):
        buf = stats.buffers[buf_id]
        gamma = rng.uniform(5, 20, G) * scale
        centers = model.means + rng.normal(0, 0.4, (G, D))
        buf.gamma[:] = gamma
        buf.aux_gamma[:] = gamma
        buf.mean_acc[:] = centers * gamma[:, None]
        buf.sec_acc[:] = (model.covars * rng.uniform(0.9, 1.1, (G, D))
                          + centers ** 2) * gamma[:, None]
        # mixture component gammas proportional to weights
        for s, (idx, w) in enumerate(model.mixtures):
            buf.mix_gamma[s, :len(idx)] = gamma[idx[0]] * np.asarray(w) \
                * rng.uniform(0.5, 1.5, len(idx))
    stats.num_ll = -100.0
    stats.den_ll = -150.0
    stats.num_frames = 500
    return stats


def weight_kld(new_w, old_w):
    return float(np.sum(new_w * np.log(new_w / old_w)))


class TestOriginalCls:
    def test_mixture_step_valid_and_bounded(self):
        model = three_state_model(seed=2)
        table = TransitionTable.from_model(model)
        stats = mmi_stats(model, table, seed=3)
        limit = 0.05
        mixtures = clsstep.cls_mixture_step(model, stats, "mmi", limit)
        for (idx, w_new), (_, w_old) in zip(mixtures, model.mixtures):
            assert w_new.sum() == pytest.approx(1.0, abs=1e-6)
            assert np.all(w_new >= 1e-6 - 1e-12)
            assert np.all(w_new <= 1.0)
            # approximate-KLD clipping keeps true KLD near/below limit
            assert weight_kld(w_new, np.asarray(w_old)) < 2 * limit

    def test_mixture_step_moves_toward_positive_gammas(self):
        model = three_state_model(seed=2)
        table = TransitionTable.from_model(model)
        stats = mmi_stats(model, table, seed=3)
        # make component 0 of mixture 0 clearly favored
        stats.buffers[ML_BUF].mix_gamma[0] = [50.0, 5.0]
        stats.buffers[MMI_BUF].mix_gamma[0] = [5.0, 5.0]
        mixtures = clsstep.cls_mixture_step(model, stats, "mmi", 0.1)
        w_new = mixtures[0][1]
        w_old = np.asarray(model.mixtures[0][1])
        assert w_new[0] > w_old[0]

    def test_mean_cov_step_bounded_kld(self):
        model = three_state_model(seed=4)
        table = TransitionTable.from_model(model)
        stats = mmi_stats(model, table, seed=5)
        limit = 0.08
        means, covars = clsstep.cls_mean_cov_step(
            model, stats, "mmi", limit, limit, min_var=0.01)
        assert np.all(covars >= 0.01)
        # mean KLD (sum dmean^2/cov) within the limit (+ tolerance)
        kld = np.sum((means - model.means) ** 2 / model.covars, axis=1)
        assert np.all(kld <= limit * 1.01)
        # log-cov move within the limit
        dc = np.log(covars) - np.log(np.maximum(model.covars, 0.01))
        assert np.all(np.sum(dc ** 2, axis=1) <= limit * 1.2)

    def test_mean_moves_toward_target_when_room(self):
        model = three_state_model(seed=4)
        table = TransitionTable.from_model(model)
        stats = mmi_stats(model, table, seed=5)
        means, _ = clsstep.cls_mean_cov_step(
            model, stats, "mmi", 1e6, 1e6, min_var=0.01)
        # huge KLD budget: mean lands exactly on the criterion target
        num = stats.buffers[ML_BUF]
        den = stats.buffers[MMI_BUF]
        d_gamma = num.gamma - den.gamma
        target = (num.mean_acc - den.mean_acc) / d_gamma[:, None]
        np.testing.assert_allclose(means, target, rtol=1e-6)

    def test_full_step_writes_model(self, tmp_path):
        from aaltoasr_tpu.cli import clsstep as cli
        model = three_state_model(seed=6)
        table = TransitionTable.from_model(model)
        stats = mmi_stats(model, table, seed=7)
        model_io.write_model(str(tmp_path / "in"), model)
        stats.dump(str(tmp_path / "st"))
        (tmp_path / "st.lst").write_text(f"{tmp_path / 'st'}\n")
        rc = cli.main(["-b", str(tmp_path / "in"),
                       "-L", str(tmp_path / "st.lst"),
                       "-o", str(tmp_path / "out"), "-M", "MMI",
                       "--limit", "0.1"])
        assert rc == 0
        out = model_io.read_model(str(tmp_path / "out"))
        assert not np.allclose(out.means, model.means)
        assert np.all(out.covars >= 0.09)


class TestKldcs:
    def test_search_lambda_finds_limit(self):
        # f decreasing in lambda: f = 1/(1+lam)
        lam = clsstep_kld.search_lambda(lambda p: 1.0 / (1 + p), 1.0,
                                        0.25)
        assert 1.0 / (1 + lam) == pytest.approx(0.25, abs=1e-4)

    def test_critical_mixture_solver_sums_to_one(self):
        w0 = np.array([0.6, 0.3, 0.1])
        gam = np.array([10.0, -2.0, 1.0])
        ag = np.array([12.0, 4.0, 2.0])
        solver = clsstep_kld.CriticalMixtureSolver(w0, gam, ag, 0.0)
        for lam in (0.0, 1.0, 10.0):
            w = solver.solve_weights(lam)
            assert w is not None
            assert w.sum() == pytest.approx(1.0, abs=1e-2)
        # larger lambda pins the weights closer to the original
        k1 = solver.evaluate(1.0)
        k2 = solver.evaluate(100.0)
        assert k2 <= k1 + 1e-9

    def test_mean_solver_lambda_monotone(self):
        mean0 = np.array([0.0, 1.0])
        cov0 = np.array([1.0, 2.0])
        ms = clsstep_kld.MeanSolver(mean0, cov0, 5.0,
                                    np.array([10.0, -2.0]))
        k_small = ms.evaluate(0.0)
        k_big = ms.evaluate(100.0)
        assert k_big < k_small
        # lambda -> inf keeps the original mean
        np.testing.assert_allclose(ms.solve(1e12), mean0, atol=1e-9)

    def test_cov_solver_limits(self):
        mean0 = np.array([0.0, 1.0])
        cov0 = np.array([1.0, 2.0])
        g = 5.0
        m1 = np.array([2.0, 4.0])
        m2 = np.array([8.0, 12.0])
        cs = clsstep_kld.CovSolver(mean0, cov0, g, m1, m2, 0.01)
        assert np.all(cs.solve(0.0) >= 0.01)
        big = cs.solve(1e12)
        np.testing.assert_allclose(big, cov0, rtol=1e-5)

    def test_full_kldcs_step(self, tmp_path):
        from aaltoasr_tpu.cli import clsstep as cli
        model = three_state_model(seed=8)
        table = TransitionTable.from_model(model)
        stats = mmi_stats(model, table, seed=9)
        model_io.write_model(str(tmp_path / "in"), model)
        stats.dump(str(tmp_path / "st"))
        (tmp_path / "st.lst").write_text(f"{tmp_path / 'st'}\n")
        rc = cli.main(["-b", str(tmp_path / "in"),
                       "-L", str(tmp_path / "st.lst"),
                       "-o", str(tmp_path / "out"), "-M", "MMI",
                       "--limit", "0.1", "--kldcs"])
        assert rc == 0
        out = model_io.read_model(str(tmp_path / "out"))
        # parameter KLDs bounded by the limit (with search tolerance)
        mean_kld = 0.5 * np.sum((out.means - model.means) ** 2
                                / model.covars, axis=1)
        assert np.all(mean_kld <= 0.1 * 1.05 + 1e-6)
        cov_kld = 0.5 * (np.sum(out.covars / model.covars
                                + np.log(model.covars / out.covars),
                                axis=1) - model.dim)
        assert np.all(cov_kld <= 0.1 * 1.05 + 1e-6)
        for (idx, w_new), (_, w_old) in zip(out.mixtures,
                                            model.mixtures):
            assert w_new.sum() == pytest.approx(1.0, abs=0.02)
            kld = float(np.sum(w_new * np.log(w_new
                                              / np.asarray(w_old))))
            assert kld <= 0.1 * 1.1 + 1e-6
