"""MPE (MPFE_PDF) statistics tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from aaltoasr_tpu.models.hmm import TransitionTable
from aaltoasr_tpu.models.hmmnet import (
    compile_hmmnet, pad_hmmnet, transcript_hmmnet)
from aaltoasr_tpu.ops.gmm import GmmScorer
from aaltoasr_tpu.train.mpe import (
    mpe_forward_backward, mpe_stats)
from aaltoasr_tpu.train import estep
from aaltoasr_tpu.ops.logsemiring import logsumexp

from tests.test_train import three_state_model


def graphs(model, table, labels, pad=None, fan=4):
    fst = transcript_hmmnet(model, table, labels, optional_silence="")
    g, _ = compile_hmmnet(fst, table)
    P = pad or int(g["num_positions"])
    return {k: jnp.asarray(v) for k, v in pad_hmmnet(g, P, fan).items()}


class TestMpeFB:
    def test_single_path_zero_gradient(self):
        """When the lattice has a single path, every path is the
        reference: expected accuracy is constant and gamma_mpe ~ 0."""
        model = three_state_model()
        # force single path: no self loops (prob 1 forward)
        model.transitions = {s: [(1, 1.0)] for s in range(3)}
        table = TransitionTable.from_model(model)
        g = graphs(model, table, ["a", "_"])
        T = 3  # exactly one frame per state
        rng = np.random.default_rng(0)
        X = rng.normal(0, 1, (T, model.dim)).astype(np.float32)
        scorer = GmmScorer.from_model(model)
        out = mpe_stats(scorer, jnp.asarray(X), g, g, jnp.int32(T),
                        table.num_slots)
        assert float(out["avg_accuracy"]) == pytest.approx(T, abs=1e-3)
        assert float(out["num"]["gamma"].sum()) < 1e-4
        assert float(out["den"]["gamma"].sum()) < 1e-4

    def test_competing_paths_sign_structure(self):
        """Denominator with a wrong-phone alternative: positions matching
        the reference get positive MPE occupancy, others negative."""
        model = three_state_model(seed=5)
        table = TransitionTable.from_model(model)
        scorer = GmmScorer.from_model(model)
        num_g = graphs(model, table, ["a"], pad=6)
        # denominator allows 'a' (states 0,1) or '_' (state 2)
        from aaltoasr_tpu.formats.fst import Fst, FstArc
        den = Fst()
        # branch: arcs for phone a (path 1) and phone _ (path 2)
        # a: state0 (slots 0 self,1 fwd), state1 (2,3); _: state2 (4,5)
        den.add_arc(FstArc(0, 1, 0))   # a s0 self-entry
        den.add_arc(FstArc(1, 1, 0))
        den.add_arc(FstArc(1, 2, 1))
        den.add_arc(FstArc(2, 2, 2))
        den.add_arc(FstArc(2, 3, 3))
        den.add_arc(FstArc(0, 4, 4))   # _ entry
        den.add_arc(FstArc(4, 4, 4))
        den.add_arc(FstArc(4, 3, 5))
        den.initial, den.final = 0, 3
        dg, _ = compile_hmmnet(den, table)
        dgp = {k: jnp.asarray(v) for k, v in
               pad_hmmnet(dg, 8, 4).items()}

        # ambiguous data leaning toward phone 'a': mix the a-state and
        # silence means so the wrong path keeps posterior mass
        rng = np.random.default_rng(6)
        T = 8
        X = np.zeros((T, model.dim), dtype=np.float32)
        states = [0] * 4 + [1] * 4
        sil_mu = model.means[model.mixtures[2][0][0]]
        for t, s in enumerate(states):
            idx, w = model.mixtures[s]
            gidx = idx[rng.choice(len(idx), p=w)]
            mu = 0.6 * model.means[gidx] + 0.4 * sil_mu
            X[t] = mu + rng.normal(0, 1.5, model.dim)
        out = mpe_stats(scorer, jnp.asarray(X), num_g, dgp,
                        jnp.int32(T), table.num_slots)
        num_occ = np.asarray(out["num"]["gamma"])
        den_occ = np.asarray(out["den"]["gamma"])
        # numerator mass on phone-a Gaussians (0..3), denominator mass
        # on silence Gaussians (4, 5)
        assert num_occ[:4].sum() > num_occ[4:6].sum()
        assert den_occ[4:6].sum() > den_occ[:4].sum()

    def test_gamma_mpe_sums_to_zero_per_frame(self):
        model = three_state_model(seed=7)
        table = TransitionTable.from_model(model)
        g = graphs(model, table, ["a", "_"])
        T = 10
        rng = np.random.default_rng(8)
        X = rng.normal(0, 2, (T, model.dim)).astype(np.float32)
        scorer = GmmScorer.from_model(model)
        gll = scorer.gaussian_log_likelihoods(jnp.asarray(X))
        sll = logsumexp(gll[:, scorer.comp_idx] + scorer.comp_logw,
                        axis=-1)
        obs = sll[:, g["pdf"]] + g["obs_const"][None, :]
        acc = jnp.ones((T, int(g["pdf"].shape[0])), jnp.float32)
        gamma, gmpe, total, avg = mpe_forward_backward(
            obs, g, jnp.int32(T), acc)
        # with constant accuracy, expected accuracy is identical on all
        # paths -> gamma_mpe vanishes
        assert float(jnp.abs(gmpe).max()) < 1e-3
        assert float(avg) == pytest.approx(T, rel=1e-4)
