"""Gaussian splitting and clustering tests."""

import numpy as np
import pytest

from aaltoasr_tpu.models.hmm import TransitionTable
from aaltoasr_tpu.train.accumulators import HmmStats, ML_BUF
from aaltoasr_tpu.train.gcluster import (
    cluster_gaussians, read_gcl, write_gcl)
from aaltoasr_tpu.train.split import split_gaussians

from tests.test_train import three_state_model


def stats_with_occupancy(model, gamma, mix_gamma=None):
    table = TransitionTable.from_model(model)
    stats = HmmStats.zeros(model, table)
    buf = stats.buffers[ML_BUF]
    buf.gamma[:] = gamma
    if mix_gamma is None:
        for s, (idx, w) in enumerate(model.mixtures):
            buf.mix_gamma[s, :len(idx)] = gamma[idx]
    return stats


class TestSplit:
    def test_splits_high_occupancy(self):
        model = three_state_model()
        gamma = np.array([100.0, 1.0, 50.0, 1.0, 80.0, 1.0])
        stats = stats_with_occupancy(model, gamma)
        new_model, n = split_gaussians(model, stats, minocc=40.0)
        assert n == 3
        assert new_model.num_gaussians == 9
        # weights halved: mixture 0 had (0.6, 0.4); gaussian 0 split
        idx, w = new_model.mixtures[0]
        assert len(idx) == 3
        k = list(idx).index(0)
        assert w[k] == pytest.approx(0.3)
        # split means are symmetric around the old mean
        old = model.means[0]
        kids = [new_model.means[0], new_model.means[6]]
        np.testing.assert_allclose((kids[0] + kids[1]) / 2, old,
                                   atol=1e-10)

    def test_numgauss_target_stops(self):
        model = three_state_model()
        gamma = np.full(6, 1000.0)
        stats = stats_with_occupancy(model, gamma)
        m1, n1 = split_gaussians(model, stats, minocc=1.0, numgauss=6)
        assert n1 == 0  # already at target
        m2, n2 = split_gaussians(model, stats, minocc=1.0, numgauss=8)
        assert m2.num_gaussians >= 6

    def test_maxg_respected(self):
        model = three_state_model()
        gamma = np.full(6, 1000.0)
        stats = stats_with_occupancy(model, gamma)
        m, n = split_gaussians(model, stats, minocc=1.0, maxg=2)
        # every mixture already has 2 components -> nothing split
        assert n == 0


class TestGcluster:
    def test_clusters_separate_groups(self):
        rng = np.random.default_rng(0)
        means = np.concatenate([rng.normal(-10, 0.5, (15, 4)),
                                rng.normal(10, 0.5, (15, 4))])
        a = cluster_gaussians(means, 2)
        assert len(np.unique(a[:15])) == 1
        assert len(np.unique(a[15:])) == 1
        assert a[0] != a[-1]

    def test_gcl_round_trip(self, tmp_path):
        a = np.array([0, 1, 1, 2, 0], dtype=np.int32)
        p = tmp_path / "x.gcl"
        write_gcl(str(p), a, 3)
        loaded, n = read_gcl(str(p))
        assert n == 3
        np.testing.assert_array_equal(loaded, a)


class TestRemoval:
    def test_delete_gaussians_keeps_best(self):
        """Low-occupancy Gaussians die, but each mixture keeps at least
        its max-weight component (HmmSet.cc:1058-1140)."""
        from aaltoasr_tpu.train.split import delete_gaussians
        from aaltoasr_tpu.train.accumulators import HmmStats, ML_BUF
        from aaltoasr_tpu.models.hmm import TransitionTable
        from tests.test_gmm import random_model
        model = random_model(G=8, S=3, D=4, K=3, seed=1)
        table = TransitionTable.from_model(model)
        stats = HmmStats.zeros(model, table)
        occ = np.array([10, 0.1, 10, 0.1, 0.1, 0.1, 10, 0.1])
        stats.buffers[ML_BUF].gamma[:8] = occ
        new, removed = delete_gaussians(model, stats, minocc=1.0)
        assert removed > 0
        assert new.num_gaussians == 8 - removed
        # weights renormalized
        for idx, w in new.mixtures:
            assert len(idx) >= 1
            np.testing.assert_allclose(w.sum(), 1.0, atol=1e-9)

    def test_delete_all_keeps_one_per_mixture(self):
        from aaltoasr_tpu.train.split import delete_gaussians
        from aaltoasr_tpu.train.accumulators import HmmStats
        from aaltoasr_tpu.models.hmm import TransitionTable
        from tests.test_gmm import random_model
        model = random_model(G=8, S=3, D=4, K=3, seed=2)
        table = TransitionTable.from_model(model)
        stats = HmmStats.zeros(model, table)   # all occupancies 0
        new, _ = delete_gaussians(model, stats, minocc=5.0)
        for idx, w in new.mixtures:
            assert len(idx) == 1
            np.testing.assert_allclose(w, [1.0])

    def test_remove_mixture_components(self):
        """Renormalize-after-each-removal loop: a component below the
        threshold can survive once the others are gone."""
        from aaltoasr_tpu.train.split import remove_mixture_components
        from aaltoasr_tpu.formats import model_io
        rng = np.random.default_rng(3)
        model = model_io.HmmModel(
            dim=3, cov_type="diagonal_cov",
            means=rng.normal(0, 1, (4, 3)), covars=np.ones((4, 3)),
            mixtures=[(np.array([0, 1, 2, 3], np.int32),
                       np.array([0.85, 0.07, 0.05, 0.03]))],
            phones=[model_io.HmmPhone("a", [0])],
            transitions={0: [(0, .5), (1, .5)]})
        new, removed = remove_mixture_components(model, 0.1)
        idx, w = new.mixtures[0]
        # 0.03 goes first, renorm; 0.05/0.97 still < 0.1 -> out; then
        # 0.07/0.92 < 0.1 -> out; 0.85 alone = 1.0
        assert len(idx) == 1
        np.testing.assert_allclose(w, [1.0])
        assert removed == 3
        assert new.num_gaussians == 1
