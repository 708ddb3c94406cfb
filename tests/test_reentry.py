"""Exact-engine re-entry compaction (`SearchConfig.reentry_topk`).

The compact path replaces the word-end [E, R] cross-word fan-in
expansion with per-entry-node top-K record selection in [E, M] space
(valid because entry arc log-probs are zero by builder invariant, so
candidate score = record total + obs[entry]).  It must produce the
same 1-best as the full expansion whenever K covers the surviving
re-entering histories.  Reference behavior being compacted:
`decoder/src/TokenPassSearch.cc` word-end re-entry through
`TPLexPrefixTree` fan-in nodes.
"""

import numpy as np
import pytest

from aaltoasr_tpu.decoder.search import BeamSearch, SearchConfig
from aaltoasr_tpu.formats.lna import read_lna

from tests.test_golden_crossword import (
    make_triphone_task, synth_crossword_lna)


@pytest.fixture(scope="module")
def task(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("reentry")
    model, words, label_id = make_triphone_task(tmp)
    from aaltoasr_tpu.decoder.toolbox import Toolbox
    t = Toolbox(str(tmp / "m.ph"))
    t.set_lm_scale(8.0)
    t.set_silence_is_word(False)
    t.lex_read(str(tmp / "our_lex.dict"))
    t.set_sentence_boundary("<s>", "</s>")
    t.ngram_read(str(tmp / "lm.arpa"))
    return tmp, model, words, label_id, t


def _decode(t, lp, **kw):
    cfg = SearchConfig(lm_scale=8.0, num_tokens=256, num_records=32,
                       **kw)
    s = BeamSearch(t.tree, t.lm, t.model, cfg)
    return s, s.decode(lp)


class TestReentryCompaction:
    def test_compact_path_activates_on_crossword_tree(self, task):
        tmp, model, words, label_id, t = task
        lna = synth_crossword_lna(tmp, model, words, label_id,
                                  ["ab", "ba"], seed=5)
        lp, _ = read_lna(lna)
        s, _ = _decode(t, lp, reentry_topk=4)
        assert s._reentry_topk == 4, "compact tables not built"

    def test_identical_to_full_expansion(self, task):
        tmp, model, words, label_id, t = task
        for i, seq in enumerate([["ab", "ba"], ["ca", "bc", "a"],
                                 ["a", "ab"]]):
            lna = synth_crossword_lna(tmp, model, words, label_id,
                                      seq, seed=10 + i,
                                      name=f"r{i}.lna")
            lp, _ = read_lna(lna)
            _, full = _decode(t, lp, reentry_topk=0)
            _, comp = _decode(t, lp, reentry_topk=4)
            assert comp.words == full.words, seq
            assert comp.log_prob == pytest.approx(full.log_prob,
                                                  rel=1e-5)

    def test_preselect_matches_full_expansion(self, task):
        """reentry_preselect >= the live row width is exactly the full
        expansion (same candidates, reordered by the static rank);
        smaller presets stay 1-best identical on this task."""
        tmp, model, words, label_id, t = task
        for i, seq in enumerate([["ab", "ba"], ["ca", "bc", "a"]]):
            lna = synth_crossword_lna(tmp, model, words, label_id,
                                      seq, seed=20 + i,
                                      name=f"p{i}.lna")
            lp, _ = read_lna(lna)
            _, full = _decode(t, lp)
            s2, wide = _decode(t, lp, reentry_preselect=10_000)
            assert s2._reentry_pre == 0      # >= R: tables not built
            plp = np.asarray(s2.tree.root_pair_logp)
            R = int(plp.shape[1])
            live = int((plp > -1e9).sum(axis=1).max())
            # P covering every row's live width keeps ALL live
            # entries -> exactly the full expansion modulo the static
            # reordering (a wiring check of the preselected tables)
            s3, pre = _decode(t, lp, reentry_preselect=live)
            assert s3._reentry_pre == live
            assert pre.words == full.words, seq
            assert pre.log_prob == pytest.approx(full.log_prob,
                                                 rel=1e-5)
            # below the live width the unigram-ranked preselect is a
            # pruning heuristic; on this task the 1-best holds
            _, pre2 = _decode(t, lp,
                              reentry_preselect=max(2, live // 2))
            assert pre2.words == full.words, seq

    def test_preselect_composes_with_prewalk(self, task):
        tmp, model, words, label_id, t = task
        lna = synth_crossword_lna(tmp, model, words, label_id,
                                  ["ab", "ba", "ca"], seed=31,
                                  name="pp.lna")
        lp, _ = read_lna(lna)
        _, full = _decode(t, lp)
        _, pre = _decode(t, lp, reentry_preselect=16,
                         reentry_prewalk=8, reentry_records=8)
        assert pre.words == full.words
        assert pre.log_prob == pytest.approx(full.log_prob, rel=1e-5)

    def test_monophone_tree_falls_back(self):
        from tests.test_decoder import make_decode_task
        model, tree, fsa = make_decode_task()
        cfg = SearchConfig(num_tokens=256, num_records=16,
                           lm_scale=1.0, reentry_topk=4)
        s = BeamSearch(tree, fsa, model, cfg)
        # monophone trees have a single re-entry row; the compact
        # tables may or may not build, but decode must still work
        from tests.test_decoder import synth_obs
        obs = synth_obs(tree, model, ["a", "b", "a"], seed=1)
        r = s.decode(obs)
        assert len(r.words) >= 1
