"""Decision-tree tying tests."""

import numpy as np
import pytest

from aaltoasr_tpu.train.tie import (
    PhonePool, center_phone, left_contexts, right_contexts)


class TestLabels:
    def test_center(self):
        assert center_phone("a-b+c") == "b"
        assert center_phone("b") == "b"
        assert center_phone("a-b") == "b"
        assert center_phone("b+c") == "b"
        assert center_phone("x-a-b+c+d") == "b"

    def test_contexts(self):
        assert left_contexts("x-a-b+c+d") == ["a", "x"]
        assert right_contexts("x-a-b+c+d") == ["c", "d"]
        assert left_contexts("b+c") == []
        assert right_contexts("a-b") == []


class TestTying:
    def make_pool(self, seed=0):
        """Center phone 'a' with left contexts from two groups whose
        statistics genuinely differ: vowel contexts shift the mean."""
        rng = np.random.default_rng(seed)
        pool = PhonePool(dim=3)
        pool.load_rules("VOWEL context e,i,o\nSTOP context k,p,t\n")
        pool.min_occupancy = 10
        pool.min_split_gain = 1.0
        for left in ["e", "i", "o", "k", "p", "t"]:
            shift = 4.0 if left in "eio" else -4.0
            cp = pool.get_context_phone(f"{left}-a+n", 0)
            X = rng.normal(shift, 1.0, (40, 3))
            cp.add(np.ones(40), X)
        return pool

    def test_splits_by_context_class(self):
        pool = self.make_pool()
        result = pool.tie()
        clusters = result[("a", 0)]
        assert len(clusters) >= 2
        # the first split must separate vowels from stops
        c0 = {m.label.split("-")[0] for m in clusters[0].members}
        assert c0 <= {"e", "i", "o"} or c0 <= {"k", "p", "t"}

    def test_min_occupancy_blocks_split(self):
        pool = self.make_pool()
        pool.min_occupancy = 1000
        result = pool.tie()
        assert len(result[("a", 0)]) == 1

    def test_make_model(self):
        pool = self.make_pool()
        pool.tie()
        model = pool.make_model()
        assert model.num_states == len(pool.result[("a", 0)])
        assert model.num_gaussians == model.num_states
        # every context phone label got an HMM with its tied state
        assert len(model.phones) == 6
        for p in model.phones:
            assert len(p.states) == 1
            assert model.transitions[p.states[0]] == [(0, 0.8), (1, 0.2)]
        # vowel-context and stop-context labels map to different states
        by_label = {p.label: p.states[0] for p in model.phones}
        assert by_label["e-a+n"] != by_label["k-a+n"]

    def test_basebind(self, tmp_path):
        pool = self.make_pool()
        pool.tie()
        p = tmp_path / "bb"
        pool.save_basebind(str(p))
        lines = p.read_text().strip().split("\n")
        assert len(lines) == 6
        for line in lines:
            parts = line.split()
            assert parts[1] == "1"

    def test_gain_math_matches_formula(self):
        # two clearly separated clusters: gain ~ N/2 * log(var ratio)
        pool = PhonePool(dim=1)
        pool.load_rules("L context x\n")
        pool.min_occupancy = 1
        pool.min_split_gain = 0.0
        a = pool.get_context_phone("x-a", 0)
        b = pool.get_context_phone("y-a", 0)
        a.add(np.ones(100), np.full((100, 1), -2.0))
        b.add(np.ones(100), np.full((100, 1), 2.0))
        result = pool.tie()
        assert len(result[("a", 0)]) == 2


class TestMergePass:
    def test_merge_rejoins_similar_clusters(self):
        """Two clusters with near-identical statistics merge back under
        a permissive loss bound; distinct ones survive a tight bound
        (PhonePool::merge_context_phones)."""
        from aaltoasr_tpu.train.tie import Cluster, PhonePool
        rng = np.random.default_rng(0)
        D = 3
        pool = PhonePool(dim=D)

        def stats_for(center_mu, label):
            from aaltoasr_tpu.train.tie import ContextPhoneStats
            st = ContextPhoneStats(label=label)
            for _ in range(50):
                x = center_mu + rng.normal(0, 1, D)
                st.add(1.0, x)
            return st

        a1 = stats_for(np.zeros(D), "x-a+y")
        a2 = stats_for(np.zeros(D), "y-a+x")     # same distribution
        b = stats_for(np.full(D, 8.0), "z-a+z")  # far away
        pool.result = {("a", 0): [Cluster([a1]), Cluster([a2]),
                                  Cluster([b])]}
        import copy
        pool2 = copy.deepcopy(pool)

        n = pool.merge(max_merge_loss=60.0)
        assert n == 1
        assert len(pool.result[("a", 0)]) == 2
        sizes = sorted(len(c.members) for c in pool.result[("a", 0)])
        assert sizes == [1, 2]

        # tight bound: nothing merges
        assert pool2.merge(max_merge_loss=1e-6) == 0
        assert len(pool2.result[("a", 0)]) == 3
