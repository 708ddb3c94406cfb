"""FstSearch (WFST decoder) tests."""

import numpy as np
import pytest

from aaltoasr_tpu.decoder.fstsearch import FstSearch
from aaltoasr_tpu.formats.fst import Fst, FstArc
from aaltoasr_tpu.models.hmm import TransitionTable

from tests.test_train import three_state_model


def word_loop_fst(table):
    """A tiny decode network: loop of (word A = states 0,1) and
    (word B = state 2) with out labels on the first arcs."""
    fst = Fst()
    # nodes: 0 = hub, word A: 0->1->2->0, word B: 0->3->0
    # state s transitions: slots 2s (self), 2s+1 (exit)
    fst.add_arc(FstArc(0, 1, 0, out_label="A"))   # into state0 (self slot)
    fst.add_arc(FstArc(1, 1, 0))                  # state0 self
    fst.add_arc(FstArc(1, 2, 1))                  # state0 exit -> state1
    fst.add_arc(FstArc(2, 2, 2))                  # state1 self
    fst.add_arc(FstArc(2, 0, 3))                  # state1 exit -> hub
    fst.add_arc(FstArc(0, 3, 4, out_label="B"))   # into state2
    fst.add_arc(FstArc(3, 3, 4))                  # state2 self
    fst.add_arc(FstArc(3, 0, 5))                  # state2 exit -> hub
    fst.initial = 0
    fst.final = 0
    return fst


class TestFstSearch:
    def test_decodes_word_sequence(self):
        model = three_state_model()
        table = TransitionTable.from_model(model)
        fst = word_loop_fst(table)
        fs = FstSearch(fst, model, table)

        # word A consumes >= 3 arcs (s0 entry, s0 exit, s1 exit) and B
        # >= 2; favor A(s0,s0,s1) B(s2,s2,s2) A(s0,s0,s1)
        T = 9
        S = model.num_states
        obs = np.full((T, S), -10.0, dtype=np.float32)
        seq = [0, 0, 1, 2, 2, 2, 0, 0, 1]
        for t, s in enumerate(seq):
            obs[t, s] = 0.0
        words, score, path = fs.run(obs)
        assert words == ["A", "B", "A"]
        assert np.isfinite(score)

    def test_lna_interface(self, tmp_path):
        from aaltoasr_tpu.formats.lna import write_lna
        model = three_state_model()
        table = TransitionTable.from_model(model)
        fst = word_loop_fst(table)
        fs = FstSearch(fst, model, table)
        obs = np.full((4, model.num_states), -8.0, dtype=np.float32)
        for t, s in enumerate([0, 0, 1, 1]):
            obs[t, s] = 0.0
        p = tmp_path / "x.lna"
        write_lna(str(p), obs, 4)
        result, score = fs.get_result_and_logprob(str(p))
        assert result == "A"


class TestFstConfidence:
    def _obs_for(self, model, seq, T=None, good=0.0, bad=-10.0):
        T = T or len(seq)
        obs = np.full((T, model.num_states), bad, dtype=np.float32)
        for t, s in enumerate(seq):
            obs[t, s] = good
        return obs

    def test_clean_and_levenshtein(self):
        from aaltoasr_tpu.decoder.fstsearch import _clean, _levenshtein
        assert _clean("A A B") == "AB"
        assert _clean("aabba") == "aba"
        assert _levenshtein("kitten", "sitting") == 3
        assert _levenshtein("", "abc") == 3

    def test_confident_vs_unconfident(self):
        """Clean acoustics along the grammar path score a clearly
        higher confidence than acoustics that fight the grammar."""
        from aaltoasr_tpu.decoder.fstsearch import FstConfidence
        model = three_state_model()
        table = TransitionTable.from_model(model)
        fc = FstConfidence(word_loop_fst(table), model, table)

        good = self._obs_for(model, [0, 0, 1, 2, 2, 2, 0, 0, 1])
        w_g, _, conf_g = fc.run_with_confidence(good)
        assert w_g == ["A", "B", "A"]

        # acoustics prefer states the grammar path cannot follow well
        rng = np.random.default_rng(0)
        bad = rng.uniform(-9, -6, good.shape).astype(np.float32)
        bad[:, 2] = -1.0          # strong free-best path off-grammar
        w_b, _, conf_b = fc.run_with_confidence(bad)
        assert conf_g > conf_b + 0.1
        assert 0.0 <= fc.token_conf <= 1.0

    def test_phone_loop_variant(self, tmp_path):
        from aaltoasr_tpu.decoder.fstsearch import (
            FstConfidenceWithPhoneLoop)
        from aaltoasr_tpu.formats.lna import write_lna
        model = three_state_model()
        table = TransitionTable.from_model(model)
        # phone loop = same network here (free alternative)
        fc = FstConfidenceWithPhoneLoop(
            word_loop_fst(table), word_loop_fst(table), model, table)
        obs = self._obs_for(model, [0, 0, 1, 2, 2, 2, 0, 0, 1])
        p = tmp_path / "c.lna"
        lg = obs - np.log(np.exp(obs).sum(axis=1, keepdims=True))
        write_lna(str(p), lg.astype(np.float32), lna_bytes=4)
        res, conf = fc.result_and_confidence(str(p))
        assert res == "A B A"
        # grammar == phone loop here: edit distance 0, agreement high
        assert fc.edit_conf == pytest.approx(1.0)
        assert 0.0 <= conf <= 1.2
