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
