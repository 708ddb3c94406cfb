"""Subspace-constrained Gaussians (PCGMM/SCGMM): math, IO, scoring.

Reference semantics: aku/Subspaces.{hh,cc} + Distributions.cc
USE_SUBSPACE_COV classes (never compiled upstream; see
ops/subspaces.py docstring for the two defects corrected here).
"""

import io

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.ops.subspaces import (
    ExponentialSubspace, PrecisionSubspace, map_m2v, map_v2m)


def _rand_spd(rng, d, scale=1.0):
    a = rng.normal(size=(d, d))
    return scale * (a @ a.T + d * np.eye(d))


class TestVecMaps:
    def test_roundtrip_and_inner_product(self):
        rng = np.random.default_rng(0)
        A = _rand_spd(rng, 5)
        B = _rand_spd(rng, 5)
        assert np.allclose(map_v2m(map_m2v(A)), A)
        # <A,B>_F == m2v(A).m2v(B) (the sqrt(2) off-diagonal scaling)
        assert np.trace(A @ B) == pytest.approx(
            float(map_m2v(A) @ map_m2v(B)))


class TestPrecisionSubspace:
    def test_recovers_in_span_precision(self):
        rng = np.random.default_rng(1)
        d = 4
        basis = np.stack([np.eye(d),
                          map_v2m(map_m2v(_rand_spd(rng, d)) * 0.1),
                          map_v2m(map_m2v(_rand_spd(rng, d)) * 0.1)])
        ps = PrecisionSubspace(basis)
        lam_true = np.array([1.0, 0.4, -0.2])
        P_true = ps.compute_precision(lam_true)
        assert np.all(np.linalg.eigvalsh(P_true) > 0)
        S = np.linalg.inv(P_true)          # sample cov = exact inverse
        lam = ps.optimize_coefficients(S)
        assert np.allclose(ps.compute_precision(lam), P_true,
                           atol=1e-5)

    def test_pca_init_reconstructs_pool(self):
        rng = np.random.default_rng(2)
        d, n = 4, 12
        covs = [_rand_spd(rng, d, 0.5) for _ in range(n)]
        ps = PrecisionSubspace.initialize_pca(
            np.ones(n), covs, basis_dim=d * (d + 1) // 2)
        # full-dimensional subspace: every precision is representable
        for s in covs[:4]:
            lam = ps.optimize_coefficients(s)
            assert np.allclose(np.linalg.inv(
                ps.compute_precision(lam)), s, atol=1e-4)
        # first basis matrix must be SPD (read_subspace asserts this)
        assert np.all(np.linalg.eigvalsh(ps.basis[0]) > 0)

    def test_io_roundtrip(self):
        rng = np.random.default_rng(3)
        ps = PrecisionSubspace(np.stack([np.eye(3),
                                         _rand_spd(rng, 3)]))
        buf = io.StringIO()
        ps.write(buf)
        ps2 = PrecisionSubspace.read(iter(buf.getvalue().split()))
        assert np.allclose(ps2.basis, ps.basis)


class TestExponentialSubspace:
    def test_recovers_in_span_gaussian(self):
        rng = np.random.default_rng(4)
        d = 3
        mu0 = rng.normal(size=d)
        P0 = np.linalg.inv(_rand_spd(rng, d))
        b0 = np.concatenate([P0 @ mu0, map_m2v(P0)])
        b1 = np.concatenate([rng.normal(size=d) * 0.1,
                             map_m2v(0.1 * np.eye(d))])
        es = ExponentialSubspace(np.stack([b0, b1]), d)
        lam_true = np.array([1.0, 0.5])
        P_true = es.compute_precision(lam_true)
        mu_true = es.compute_mu(lam_true)
        S_true = np.linalg.inv(P_true)
        lam = es.optimize_coefficients(mu_true, S_true)
        assert np.allclose(es.compute_precision(lam), P_true, atol=1e-4)
        assert np.allclose(es.compute_mu(lam), mu_true, atol=1e-4)

    def test_pca_init_and_K(self):
        rng = np.random.default_rng(5)
        d, n = 3, 10
        covs = [_rand_spd(rng, d, 0.4) for _ in range(n)]
        means = [rng.normal(size=d) for _ in range(n)]
        dim = d + d * (d + 1) // 2
        es = ExponentialSubspace.initialize_pca(
            np.ones(n), covs, means, basis_dim=dim + 1)
        for s, m in zip(covs[:3], means[:3]):
            lam = es.optimize_coefficients(m, s)
            assert np.allclose(np.linalg.inv(
                es.compute_precision(lam)), s, atol=1e-3)
            assert np.allclose(es.compute_mu(lam), m, atol=1e-3)
        # K equals the true Gaussian log-normalizer
        theta = es.compute_theta(lam)
        psi, P = es.split_theta(theta)
        mu = np.linalg.solve(P, psi)
        # log N(mu) = K + theta'f(mu) must equal the closed form
        f = es.exp_feature(mu, np.outer(mu, mu))
        ll = es.K(theta) + float(theta @ f)
        sign, ld = np.linalg.slogdet(P)
        ll_ref = -0.5 * d * np.log(2 * np.pi) + 0.5 * ld
        assert ll == pytest.approx(ll_ref, abs=1e-8)


def _toy_model(rng, d=4, G=6, kind="diag"):
    means = rng.normal(0, 2, (G, d))
    covars = rng.uniform(0.5, 2.0, (G, d))
    mixtures = [(np.array([2 * i, 2 * i + 1], np.int32),
                 np.array([0.5, 0.5])) for i in range(G // 2)]
    phones = [model_io.HmmPhone(f"p{i}", [i]) for i in range(G // 2)]
    transitions = {i: [(0, 0.5), (1, 0.5)] for i in range(G // 2)}
    return model_io.HmmModel(
        dim=d, cov_type="diagonal_cov", means=means, covars=covars,
        mixtures=mixtures, phones=phones, transitions=transitions)


class TestGconvertAndScoring:
    def _convert(self, tmp_path, rng, flag):
        from aaltoasr_tpu.cli.gconvert import main
        model = _toy_model(rng)
        model_io.write_model(str(tmp_path / "in"), model)
        dvec = 4 * 5 // 2
        ssdim = (dvec if flag == "--to-pcgmm" else 4 + dvec)
        rc = main(["-b", str(tmp_path / "in"),
                   "-o", str(tmp_path / "out"), flag,
                   "--ssdim", str(ssdim)])
        assert rc == 0
        return model, model_io.read_model(str(tmp_path / "out"))

    @pytest.mark.parametrize("flag,kind", [("--to-pcgmm", "pcgmm"),
                                           ("--to-scgmm", "scgmm")])
    def test_convert_io_and_scores(self, tmp_path, flag, kind):
        from aaltoasr_tpu.ops.gmm import GmmScorer
        rng = np.random.default_rng(7)
        orig, conv = self._convert(tmp_path, rng, flag)
        assert conv.gauss_kind == [kind] * orig.num_gaussians
        # full-dimensional subspace: parameters survive the constraint
        # + the text round-trip
        assert np.allclose(conv.means, orig.means, atol=1e-3)
        for g in range(orig.num_gaussians):
            assert np.allclose(conv.full_covars[g],
                               np.diag(orig.covars[g]), atol=1e-3)
        # factored device scoring == dense diagonal scoring (up to the
        # 2*pi convention: scgmm's K includes it, diag scoring doesn't)
        sc_orig = GmmScorer.from_model(orig)
        sc_conv = GmmScorer.from_model(conv)
        assert len(sc_conv.sub_basis) == 1
        x = rng.normal(0, 1.5, (10, 4)).astype(np.float32)
        a = np.asarray(sc_orig.gaussian_log_likelihoods(x))
        b = np.asarray(sc_conv.gaussian_log_likelihoods(x))
        G = orig.num_gaussians
        if kind == "scgmm":
            b = b + 0.5 * 4 * np.log(2 * np.pi)
        assert np.allclose(a[:, :G], b[:, :G], atol=2e-2)

    def test_write_read_exact_roundtrip(self, tmp_path):
        rng = np.random.default_rng(8)
        _, conv = self._convert(tmp_path, rng, "--to-pcgmm")
        model_io.write_model(str(tmp_path / "again"), conv)
        back = model_io.read_model(str(tmp_path / "again"))
        ss1 = conv.precision_subspaces[1]
        ss2 = back.precision_subspaces[1]
        assert np.allclose(ss1.basis, ss2.basis)
        for g, (sid, tm, lam) in conv.pcgmm_params.items():
            sid2, tm2, lam2 = back.pcgmm_params[g]
            assert sid2 == sid
            assert np.allclose(tm2, tm)
            assert np.allclose(lam2, lam)


class TestSubspaceMStep:
    def test_estimate_ml_reoptimizes_pcgmm(self):
        """estimate_ml fits PCGMM coefficients to the accumulated
        sample covariance (set_parameters -> optimize_coefficients)."""
        from aaltoasr_tpu.models.hmm import TransitionTable
        from aaltoasr_tpu.train.accumulators import (
            HmmStats, ML_BUF, PDF_ML_STATS, PDF_ML_FULL_STATS)
        from aaltoasr_tpu.train.estimate import estimate_ml
        rng = np.random.default_rng(9)
        model = _toy_model(rng)
        D, G = model.dim, model.num_gaussians
        dvec = D * (D + 1) // 2
        # dvec+1: S_0 replaces one scatter eigendirection, so exact
        # recovery needs one extra basis matrix
        ps = PrecisionSubspace.initialize_pca(
            np.ones(G), [np.diag(model.covars[g]) for g in range(G)],
            basis_dim=dvec + 1)
        model.cov_type = "variable"
        model.gauss_kind = ["pcgmm"] * G
        model.precision_subspaces = {1: ps}
        for g in range(G):
            lam = ps.optimize_coefficients(np.diag(model.covars[g]))
            model.pcgmm_params[g] = (
                1, ps.compute_precision(lam) @ model.means[g], lam)
        model.full_covars = {
            g: np.linalg.inv(ps.compute_precision(
                model.pcgmm_params[g][2])) for g in range(G)}

        table = TransitionTable.from_model(model)
        stats = HmmStats.zeros(model, table,
                               PDF_ML_STATS | PDF_ML_FULL_STATS)
        buf = stats.buffers[ML_BUF]
        L = rng.normal(0, 0.3, (D, D))
        C_true = L @ L.T + np.eye(D)
        mu_true = rng.normal(0, 1, D)
        n = 2000.0
        X = rng.multivariate_normal(mu_true, C_true, int(n))
        buf.gamma[:] = 1e-3
        buf.gamma[0] = n
        buf.mean_acc[0] = X.sum(axis=0)
        buf.sec_acc[0] = (X * X).sum(axis=0)
        buf.ensure_full()
        buf.full_acc[0] = X.T @ X
        for s in range(model.num_states):
            buf.mix_gamma[s, 0] = 1.0
        new = estimate_ml(model, table, stats, minvar=1e-4)
        want_mu = X.mean(0)
        want_C = X.T @ X / n - np.outer(want_mu, want_mu)
        # full-dimensional subspace -> exact sample-cov recovery
        sid, tm, lam = new.pcgmm_params[0]
        P = ps.compute_precision(lam)
        np.testing.assert_allclose(np.linalg.inv(P), want_C,
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.linalg.solve(P, tm), want_mu,
                                   rtol=1e-4, atol=1e-6)
        # untouched Gaussians keep their parameters
        assert np.allclose(new.pcgmm_params[1][2],
                           model.pcgmm_params[1][2])


class TestMixedVariablePool:
    def test_diag_full_pcgmm_in_one_pool(self, tmp_path):
        """One 'variable' .gk mixing diag + full + pcgmm rows
        (PDFPool::read_gk handles arbitrary per-row kinds); IO
        round-trips and the scorer matches per-kind references."""
        from aaltoasr_tpu.ops.gmm import GmmScorer
        rng = np.random.default_rng(21)
        model = _toy_model(rng)
        G, d = model.num_gaussians, model.dim
        # gaussian 1 -> full covariance
        L = rng.normal(0, 0.2, (d, d))
        C1 = L @ L.T + np.diag(model.covars[1])
        # gaussian 2 -> pcgmm over a full-dimensional subspace
        dvec = d * (d + 1) // 2
        ps = PrecisionSubspace.initialize_pca(
            np.ones(G), [np.diag(model.covars[g]) for g in range(G)],
            basis_dim=dvec + 1)
        lam = ps.optimize_coefficients(np.diag(model.covars[2]))
        P2 = ps.compute_precision(lam)
        model.cov_type = "variable"
        model.gauss_kind = ["diag", "full", "pcgmm"] + ["diag"] * (G - 3)
        model.full_covars = {1: C1}
        model.precision_subspaces = {1: ps}
        model.pcgmm_params = {2: (1, P2 @ model.means[2], lam)}

        model_io.write_model(str(tmp_path / "mix"), model)
        back = model_io.read_model(str(tmp_path / "mix"))
        assert back.gauss_kind[:3] == ["diag", "full", "pcgmm"]
        assert np.allclose(back.full_covars[1], C1)
        assert np.allclose(back.pcgmm_params[2][2], lam)

        sc = GmmScorer.from_model(back)
        x = rng.normal(0, 1.5, (8, d)).astype(np.float32)
        out = np.asarray(sc.gaussian_log_likelihoods(x))
        # diag reference
        prec0 = 1.0 / model.covars[0]
        want0 = (0.5 * np.log(prec0.prod())
                 - 0.5 * ((x - model.means[0]) ** 2 * prec0).sum(1))
        np.testing.assert_allclose(out[:, 0], want0, rtol=1e-4,
                                   atol=1e-3)
        # full reference
        P1 = np.linalg.inv(C1)
        dx = x - model.means[1]
        want1 = (0.5 * np.linalg.slogdet(P1)[1]
                 - 0.5 * np.einsum("ti,ij,tj->t", dx, P1, dx))
        np.testing.assert_allclose(out[:, 1], want1, rtol=1e-4,
                                   atol=2e-3)
        # pcgmm reference (same density through the factored path)
        dx = x - model.means[2]
        want2 = (0.5 * np.linalg.slogdet(P2)[1]
                 - 0.5 * np.einsum("ti,ij,tj->t", dx, P2, dx))
        np.testing.assert_allclose(out[:, 2], want2, rtol=1e-4,
                                   atol=2e-3)
