"""opt_ebw_d: per-Gaussian EBW-D optimization (aku/opt_ebw_d.cc)."""

import math
import subprocess
import sys

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.models.hmm import TransitionTable
from aaltoasr_tpu.train import opt_ebw_d as od
from aaltoasr_tpu.train.accumulators import (
    HmmStats, ML_BUF, MMI_BUF, PDF_ML_STATS, PDF_MMI_STATS)

from tests.test_train import three_state_model


def make_stats(model, table, seed=1, mmi=True):
    """Synthetic but self-consistent accumulator stats."""
    rng = np.random.default_rng(seed)
    G, D = model.means.shape
    mode = PDF_ML_STATS | (PDF_MMI_STATS if mmi else 0)
    stats = HmmStats.zeros(model, table, mode)
    for buf in stats.buffers.values():
        gamma = rng.uniform(5, 50, G)
        centers = model.means + rng.normal(0, 0.5, (G, D))
        buf.gamma[:] = gamma
        buf.mean_acc[:] = centers * gamma[:, None]
        buf.sec_acc[:] = (model.covars * rng.uniform(0.8, 1.2, (G, D))
                          + centers ** 2) * gamma[:, None]
    stats.num_ll = -1234.5
    stats.den_ll = -2345.6
    stats.num_frames = 1000
    return stats


class TestFileIO:
    def test_d_file_roundtrip(self, tmp_path):
        d = np.array([1.5, 2.0, 0.0])
        mn = np.array([0.5, 1.0, 0.0])
        mx = np.array([10.0, -1.0, 5.0])
        path = tmp_path / "d.txt"
        od.write_d_file(path, d, mn, mx)
        d2, mn2, mx2 = od.read_d_file(path, 3)
        np.testing.assert_allclose(d2, d)
        np.testing.assert_allclose(mn2, mn)
        np.testing.assert_allclose(mx2, mx)

    def test_qp_state_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        step = rng.normal(0, 1, 7)
        grad = rng.normal(0, 1, 7)
        path = tmp_path / "qp.state"
        od.write_qp_state(path, step, grad)
        s2, g2 = od.read_qp_state(path)
        np.testing.assert_allclose(s2, step)
        np.testing.assert_allclose(g2, grad)
        assert od.read_qp_state(tmp_path / "missing") is None


class TestClustering:
    def test_modes(self):
        model = three_state_model()
        G = model.num_gaussians
        assert list(od.gaussian_clusters(model, "none")) == list(range(G))
        assert set(od.gaussian_clusters(model, "global")) == {0}
        mix = od.gaussian_clusters(model, "mix")
        assert mix[0] == mix[1] and mix[2] == mix[3] and mix[0] != mix[2]
        pho = od.gaussian_clusters(model, "pho")
        # 'a' has 2 states -> 2 clusters, '_' 1 state -> 1 cluster
        assert len(set(pho)) == 3


class TestGradient:
    def test_matches_numerical_derivative(self):
        """gauss_gradient == d/dD of the negative control-set
        log-likelihood under the D-smoothed ML update (the closed forms
        in extract_gradient, opt_ebw_d.cc:316-454)."""
        model = three_state_model(seed=3)
        table = TransitionTable.from_model(model)
        control = make_stats(model, table, seed=4, mmi=False)
        train = make_stats(model, table, seed=5, mmi=False)
        G, D = model.means.shape
        d0 = np.full(G, 3.0)
        ac = 0.7

        def control_score(dvec):
            # -ac * sum_g sum_dims gamma-weighted log N under the
            # D-smoothed parameters (minvar clip included)
            t = train.buffers[ML_BUF]
            c = control.buffers[ML_BUF]
            mean = model.means
            cov = model.covars
            div = t.gamma + dvec
            nm = (t.mean_acc + dvec[:, None] * mean) / div[:, None]
            nc = ((t.sec_acc + dvec[:, None] * (cov + mean ** 2))
                  / div[:, None] - nm ** 2)
            nc = np.maximum(nc, od.MINVAR)
            ll = -0.5 * (np.log(2 * math.pi * nc) * c.gamma[:, None]
                         + (c.sec_acc - 2 * c.mean_acc * nm
                            + c.gamma[:, None] * nm ** 2) / nc)
            return -ac * ll.sum(axis=1)

        grad = od.gauss_gradient(model, control, train, d0, ac,
                                 "ml", "ml")
        eps = 1e-5
        for g in range(G):
            dp = d0.copy()
            dp[g] += eps
            dm = d0.copy()
            dm[g] -= eps
            num = (control_score(dp)[g] - control_score(dm)[g]) / (2 * eps)
            assert grad[g] == pytest.approx(num, rel=1e-4, abs=1e-8)

    def test_combine_discards_pinned(self):
        gg = np.array([1.0, 2.0, 4.0])
        cluster = np.array([0, 0, 1])
        d_params = np.array([2.0, 3.0])
        gaussian_d = np.array([2.0, 0.5, 3.0])   # #1 at its minimum
        min_d = np.array([0.1, 0.5, 0.1])
        max_d = np.full(3, -1.0)
        grad, n_disc = od.combine_gradient(
            gg, cluster, d_params, gaussian_d, min_d, max_d,
            np.array([0.1, 0.1]), np.array([-1.0, -1.0]))
        assert n_disc == 1
        # log-domain: (sum of active gaussian grads) * d
        np.testing.assert_allclose(grad, [1.0 * 2.0, 4.0 * 3.0])


class TestQpStep:
    def test_first_gradient_step_then_hessian(self):
        # minimize f(logd) = (logd - target)^2 -> gradient 2(logd-target)
        target = math.log(5.0)
        d = np.array([2.0])
        mn = np.array([0.1])
        mx = np.array([100.0])
        grad = 2 * (np.log(d) - target)
        d1, prev_step = od.gradient_step(d, grad, mn, mx, 1.0)
        assert d1[0] > d[0]                     # moved toward 5
        prev_grad = grad
        for _ in range(40):
            grad = 2 * (np.log(d1) - target)
            d1, prev_step, conv = od.qp_step(
                d1, grad, prev_step, prev_grad, mn, mx)
            prev_grad = grad
            if conv:
                break
        assert d1[0] == pytest.approx(5.0, rel=0.05)

    def test_limits_enforced(self):
        d = np.array([1.0, 1.0])
        grad = np.array([-100.0, 100.0])        # big push up / down
        mn = np.array([0.5, 0.9])
        mx = np.array([1.05, -1.0])
        d1, _ = od.gradient_step(d, grad, mn, mx, 1.0)
        assert d1[0] <= 1.05 + 1e-12
        assert d1[1] >= 0.9 - 1e-12

    def test_realize_gaussian_d(self):
        d_params = np.array([0.2, 5.0])
        cluster = np.array([0, 1, 1])
        mn = np.array([1.0, 1.0, 1.0])
        mx = np.array([-1.0, 4.0, -1.0])
        out = od.realize_gaussian_d(d_params, cluster, mn, mx)
        np.testing.assert_allclose(out, [1.0, 4.0, 5.0])
        relaxed = od.realize_gaussian_d(d_params, cluster, mn, mx,
                                        relaxed_min=True, gmin_gamma=0.75)
        # relaxed minimum stays above gamma*min and below min
        assert 0.75 <= relaxed[0] <= 1.0


class TestCli:
    def _dump(self, model, table, tmp_path, name, seed):
        stats = make_stats(model, table, seed=seed)
        base = tmp_path / name
        stats.dump(str(base))
        lst = tmp_path / f"{name}.lst"
        lst.write_text(f"{base}\n")
        return lst

    def test_full_flow(self, tmp_path):
        from aaltoasr_tpu.cli import opt_ebw_d as cli
        model = three_state_model(seed=7)
        table = TransitionTable.from_model(model)
        G = model.num_gaussians
        model_io.write_model(str(tmp_path / "m"), model)
        clist = self._dump(model, table, tmp_path, "control", seed=11)
        tlist = self._dump(model, table, tmp_path, "train", seed=12)
        dfile = tmp_path / "gauss.d"
        od.write_d_file(dfile, np.full(G, 2.0), np.full(G, 0.5),
                        np.full(G, 50.0))
        common = ["-b", str(tmp_path / "m"), "-L", str(clist),
                  "-T", str(tlist), "-F", str(tmp_path / "qp.state"),
                  "-o", str(tmp_path / "gauss_out.d"),
                  "--control", "mmi", "--train", "mmi",
                  "-D", str(dfile), "-A", "1.0"]
        # --d-init writes the realized D file and exits 0
        assert cli.main(common + ["--d-init"]) == 0
        d, mn, mx = od.read_d_file(tmp_path / "gauss_out.d", G)
        assert np.all(d >= mn) and np.all(d <= mx)
        # first iteration needs --initscale
        assert cli.main(common + ["--initscale", "0.5"]) == 0
        assert (tmp_path / "qp.state").exists()
        d1, _, _ = od.read_d_file(tmp_path / "gauss_out.d", G)
        # subsequent iterations run QuickProp off the state file
        rc = cli.main(common)
        assert rc in (0, 1)
        d2, _, _ = od.read_d_file(tmp_path / "gauss_out.d", G)
        assert np.all(d2 >= 0.5) and np.all(d2 <= 50.0)

    def test_cluster_flow(self, tmp_path):
        from aaltoasr_tpu.cli import opt_ebw_d as cli
        model = three_state_model(seed=8)
        table = TransitionTable.from_model(model)
        G = model.num_gaussians
        model_io.write_model(str(tmp_path / "m"), model)
        clist = self._dump(model, table, tmp_path, "control", seed=21)
        tlist = self._dump(model, table, tmp_path, "train", seed=22)
        dfile = tmp_path / "gauss.d"
        od.write_d_file(dfile, np.full(G, 2.0), np.full(G, 0.5),
                        np.full(G, 50.0))
        common = ["-b", str(tmp_path / "m"), "-L", str(clist),
                  "-T", str(tlist), "-F", str(tmp_path / "qp.state"),
                  "-o", str(tmp_path / "gauss_out.d"),
                  "--cluster", "mix",
                  "--cluster-d", str(tmp_path / "cluster.d"),
                  "--control", "mmi", "--train", "mmi",
                  "-D", str(dfile)]
        assert cli.main(common + ["--initscale", "0.5"]) == 0
        S = len(model.mixtures)
        dc, _, _ = od.read_d_file(tmp_path / "cluster.d", S)
        assert len(dc) == S
        assert cli.main(common) in (0, 1)
