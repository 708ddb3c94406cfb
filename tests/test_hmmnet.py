"""Hmmnet FST tests: format round trip, compile, FB equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

from aaltoasr_tpu.formats.fst import (
    EPSILON, Fst, FstArc, parse_fst, write_fst)
from aaltoasr_tpu.models.hmm import TransitionTable, build_chain, pad_chain
from aaltoasr_tpu.models.hmmnet import (
    compile_hmmnet, pad_hmmnet, transcript_hmmnet)
from aaltoasr_tpu.ops.gmm import GmmScorer
from aaltoasr_tpu.train import estep

from tests.test_train import three_state_model


class TestFstFormat:
    def test_parse_basic(self):
        text = "I 0\nF 3\nT 0 1 5;a ,\nT 1 2 #a\nT 2 3 , , -1.5\n"
        fst = parse_fst(text)
        assert fst.initial == 0 and fst.final == 3
        assert fst.arcs[0].transition_index == 5
        assert fst.arcs[0].label == "a"
        assert fst.arcs[1].transition_index == EPSILON
        assert fst.arcs[1].label == "a"
        assert fst.arcs[2].transition_index == EPSILON
        assert fst.arcs[2].score == -1.5

    def test_round_trip(self, tmp_path):
        fst = Fst(initial=0, final=2, num_nodes=3)
        fst.add_arc(FstArc(0, 1, 3, label="x"))
        fst.add_arc(FstArc(1, 1, 4))
        fst.add_arc(FstArc(1, 2, score=-0.25))
        p = tmp_path / "t.fst"
        write_fst(fst, str(p))
        fst2 = parse_fst(p.read_text())
        assert fst2.initial == 0 and fst2.final == 2
        assert len(fst2.arcs) == 3
        assert fst2.arcs[0].transition_index == 3
        assert fst2.arcs[1].transition_index == 4
        assert fst2.arcs[2].transition_index == EPSILON
        assert fst2.arcs[2].score == pytest.approx(-0.25)


class TestHmmnetEquivalence:
    def _obs(self, model, T, seed=0):
        scorer = GmmScorer.from_model(model)
        rng = np.random.default_rng(seed)
        X = rng.normal(0, 2, (T, model.dim)).astype(np.float32)
        return X, scorer

    def test_linear_hmmnet_matches_chain(self):
        """A silence-free transcript hmmnet must reproduce the chain FB
        exactly (same total LL, same state occupancies, same transition
        statistics)."""
        model = three_state_model()
        table = TransitionTable.from_model(model)
        labels = ["a", "_", "a"]
        T = 14
        X, scorer = self._obs(model, T)

        chain = build_chain(model, table, labels)
        cg = {k: jnp.asarray(v) for k, v in
              pad_chain(chain, chain.num_positions).items()}
        cstats = estep.chain_stats(scorer, jnp.asarray(X), cg,
                                   jnp.int32(T), table.num_slots)

        fst = transcript_hmmnet(model, table, labels,
                                optional_silence="")
        graph, _ = compile_hmmnet(fst, table)
        hg = {k: jnp.asarray(v) for k, v in
              pad_hmmnet(graph, int(graph["num_positions"])).items()}
        hstats = estep.chain_stats(scorer, jnp.asarray(X), hg,
                                   jnp.int32(T), table.num_slots)

        assert float(hstats["log_likelihood"]) == pytest.approx(
            float(cstats["log_likelihood"]), rel=1e-5)
        np.testing.assert_allclose(
            np.asarray(hstats["gamma"]), np.asarray(cstats["gamma"]),
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(hstats["mean_acc"]), np.asarray(cstats["mean_acc"]),
            rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(hstats["trans_acc"]), np.asarray(cstats["trans_acc"]),
            rtol=1e-3, atol=1e-3)

    def test_optional_silence_increases_likelihood(self):
        model = three_state_model()
        table = TransitionTable.from_model(model)
        labels = ["a"]
        T = 12
        X, scorer = self._obs(model, T, seed=4)

        f1 = transcript_hmmnet(model, table, labels, optional_silence="")
        f2 = transcript_hmmnet(model, table, labels, optional_silence="_")
        g1, _ = compile_hmmnet(f1, table)
        g2, _ = compile_hmmnet(f2, table)
        s1 = estep.chain_stats(
            scorer, jnp.asarray(X),
            {k: jnp.asarray(v) for k, v in
             pad_hmmnet(g1, int(g1["num_positions"])).items()},
            jnp.int32(T), table.num_slots)
        s2 = estep.chain_stats(
            scorer, jnp.asarray(X),
            {k: jnp.asarray(v) for k, v in
             pad_hmmnet(g2, int(g2["num_positions"])).items()},
            jnp.int32(T), table.num_slots)
        assert float(s2["log_likelihood"]) >= float(
            s1["log_likelihood"]) - 1e-5
        # occupancy still sums to one state per frame
        assert float(s2["gamma"].sum()) == pytest.approx(T, rel=1e-4)

    def test_static_scores_shift_total(self):
        # a constant epsilon score on the entry must shift total LL by it
        model = three_state_model()
        table = TransitionTable.from_model(model)
        T = 8
        X, scorer = self._obs(model, T, seed=6)
        fst = transcript_hmmnet(model, table, ["a"], optional_silence="")
        # add a scored epsilon before the whole net
        for a in fst.arcs:
            a.source += 1
            a.target += 1
        fst.num_nodes += 1
        fst.final += 1
        fst.add_arc(FstArc(0, fst.initial + 1, score=-2.5))
        fst.initial = 0
        g, _ = compile_hmmnet(fst, table)
        s = estep.chain_stats(
            scorer, jnp.asarray(X),
            {k: jnp.asarray(v) for k, v in
             pad_hmmnet(g, int(g["num_positions"])).items()},
            jnp.int32(T), table.num_slots)

        fst0 = transcript_hmmnet(model, table, ["a"], optional_silence="")
        g0, _ = compile_hmmnet(fst0, table)
        s0 = estep.chain_stats(
            scorer, jnp.asarray(X),
            {k: jnp.asarray(v) for k, v in
             pad_hmmnet(g0, int(g0["num_positions"])).items()},
            jnp.int32(T), table.num_slots)
        assert float(s["log_likelihood"]) == pytest.approx(
            float(s0["log_likelihood"]) - 2.5, rel=1e-5)
