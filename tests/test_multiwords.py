"""Multiword support: LM-unit multiwords ("give_me") scored as their
component sequence with split_multiwords, or as whole LM units without.

Reference: LMHistory components (`LMHistory.hh:50,117-128`),
`Toolbox::set_split_multiwords` (Toolbox.hh:223-232),
`TokenPassSearch::create_word_repository` (TokenPassSearch.cc:1689-1734,
silences excluded) and `split_and_compute_ngram_score`
(TokenPassSearch.cc:1818-1843); golden parity runs the built reference
decoder with --split-multiwords.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.arpa import ArpaLM, write_arpa

sys.path.insert(0, os.path.dirname(__file__))

from test_golden_decode import ref_driver, synth_lna  # noqa: E402,F401

from aaltoasr_tpu.decoder.search import multiword_components  # noqa: E402


class FakeLM:
    def __init__(self, words):
        self.word_index = {w: i for i, w in enumerate(words)}


class TestComponentTable:
    def test_split_and_padding(self):
        lm = FakeLM(["give", "me", "a", "_"])
        comp, lm_id, first, last = multiword_components(
            ["give_me_a", "give", "_", "me_gone"], lm, split=True)
        assert comp.shape == (4, 3)
        assert comp[0].tolist() == [0, 1, 2]          # give me a
        assert comp[1].tolist() == [0, -1, -1]
        assert comp[2].tolist() == [3, -1, -1]        # silence unsplit
        assert lm_id[0] == 0 and lm_id[1] == 0 and lm_id[2] == 3
        # "gone" missing from the LM: whole multiword pruned
        assert lm_id[3] == -1
        assert first[0] == "give" and last[0] == "a"

    def test_no_split_whole_units(self):
        lm = FakeLM(["give_me", "give"])
        comp, lm_id, first, last = multiword_components(
            ["give_me", "give"], lm, split=False)
        assert comp.shape == (2, 1)
        assert lm_id.tolist() == [0, 1]
        assert first == ["give_me", "give"]


def make_mw_task(tmp_path, with_mw_in_lm):
    """Monophone task with lexicon multiwords; LM over components
    (with_mw_in_lm=False) or with the multiword as a unit."""
    phones = ["a", "b", "c"]
    S = 3 * len(phones) + 4
    D = 1
    phone_list = [model_io.HmmPhone(p, [3 * i, 3 * i + 1, 3 * i + 2])
                  for i, p in enumerate(phones)]
    phone_list.append(model_io.HmmPhone("_", [9]))
    phone_list.append(model_io.HmmPhone("__", [10, 11, 12]))
    model = model_io.HmmModel(
        dim=D, cov_type="diagonal_cov",
        means=np.zeros((S, D)), covars=np.ones((S, D)),
        mixtures=[(np.array([i], np.int32), np.array([1.0]))
                  for i in range(S)],
        phones=phone_list,
        transitions={i: [(0, 0.5), (1, 0.5)] for i in range(S)})
    model_io.write_ph(str(tmp_path / "m.ph"), model)

    lex = {"ab": ["a", "b"], "ca": ["c", "a"], "bc": ["b", "c"],
           "ab_ca": ["a", "b", "c", "a"]}
    lines = ["_ _", "__ __", "<s>(1.0)", "</s>(1.0)"] \
        + [f"{w} {' '.join(ps)}" for w, ps in sorted(lex.items())]
    (tmp_path / "lex.dict").write_text("\n".join(lines) + "\n")

    vocab = ["</s>", "<s>", "ab", "bc", "ca"]
    if with_mw_in_lm:
        vocab.append("ab_ca")
    wi = {w: i for i, w in enumerate(vocab)}
    uni = {(wi[w],): (-0.9, -0.3) for w in vocab}
    uni[(wi["<s>"],)] = (-99.0, -0.3)
    bi = {(wi["<s>"], wi["ab"]): (-0.3, 0.0),
          (wi["ab"], wi["ca"]): (-0.4, 0.0),
          (wi["ca"], wi["</s>"]): (-0.3, 0.0)}
    if with_mw_in_lm:
        bi[(wi["<s>"], wi["ab_ca"])] = (-0.2, 0.0)
        bi[(wi["ab_ca"], wi["</s>"])] = (-0.2, 0.0)
    lm = ArpaLM(order=2, vocab=vocab, word_index=wi,
                ngrams=[{}, uni, bi])
    write_arpa(lm, str(tmp_path / "lm.arpa"))
    return model, lex


def run_reference_mw(driver, tmp_path, lna, split, penalty=-2.0):
    args = [driver, "--ph", str(tmp_path / "m.ph"),
            "--lex", str(tmp_path / "lex.dict"),
            "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
            "--beam", "400", "--token-limit", "100000",
            "--lm-scale", "10", "--dur-scale", "0",
            "--trans-scale", "1", "--no-crossword",
            "--insertion-penalty", str(penalty)]
    if split:
        args.append("--split-multiwords")
    out = subprocess.run(args, check=True, capture_output=True,
                         text=True, timeout=300)
    return [w for w in out.stdout.split()
            if w not in ("<s>", "</s>", "*")]


def run_ours_mw(tmp_path, lna, split, penalty=-2.0, dense=False):
    from aaltoasr_tpu.decoder.toolbox import Toolbox
    from aaltoasr_tpu.formats.lna import read_lna
    t = Toolbox(str(tmp_path / "m.ph"))
    t.set_lm_scale(10.0)
    t.set_global_beam(400.0)
    t.set_duration_scale(0.0)
    t.set_insertion_penalty(penalty)
    t.set_require_sentence_end(True)
    t.set_silence_is_word(False)
    t.set_optional_short_silence(True)
    t.set_split_multiwords(split)
    t.lex_read(str(tmp_path / "lex.dict"))
    t.set_sentence_boundary("<s>", "</s>")
    t.ngram_read(str(tmp_path / "lm.arpa"))
    if dense:
        from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch
        search = DenseBeamSearch(t.tree, t.lm, t.model, t.config)
        res = search.decode(read_lna(lna)[0])
    else:
        res = t.lna_decode(lna)
    return [w for w in res.words if w not in ("<s>", "</s>")]


class TestMultiwordGolden:
    def test_split_scores_components(self, ref_driver, tmp_path):
        """LM has only components: with splitting the multiword is
        viable and (with a per-word penalty) wins over the two-word
        path — identically to the reference."""
        model, lex = make_mw_task(tmp_path, with_mw_in_lm=False)
        lna = synth_lna(tmp_path, model, lex, ["ab_ca"], seed=3,
                        noise=0.2, name="mw.lna")
        ref = run_reference_mw(ref_driver, tmp_path, lna, split=True)
        ours = run_ours_mw(tmp_path, lna, split=True)
        assert ours == ref
        assert "ab_ca" in ours  # the multiword unit itself decodes

    def test_no_split_requires_lm_unit(self, ref_driver, tmp_path):
        """Without splitting, a multiword missing from the LM is
        pruned (TokenPassSearch.cc:846-862): the two-word path wins on
        both engines."""
        model, lex = make_mw_task(tmp_path, with_mw_in_lm=False)
        lna = synth_lna(tmp_path, model, lex, ["ab", "ca"], seed=4,
                        noise=0.2, name="mw2.lna")
        ref = run_reference_mw(ref_driver, tmp_path, lna, split=False)
        ours = run_ours_mw(tmp_path, lna, split=False)
        assert ours == ref
        assert "ab_ca" not in ours

    def test_no_split_with_lm_unit(self, ref_driver, tmp_path):
        """Multiword present in the LM as a unit: whole-unit scoring
        matches the reference with splitting off."""
        model, lex = make_mw_task(tmp_path, with_mw_in_lm=True)
        lna = synth_lna(tmp_path, model, lex, ["ab_ca"], seed=5,
                        noise=0.2, name="mw3.lna")
        ref = run_reference_mw(ref_driver, tmp_path, lna, split=False)
        ours = run_ours_mw(tmp_path, lna, split=False)
        assert ours == ref
        assert "ab_ca" in ours

    def test_dense_engine_split(self, ref_driver, tmp_path):
        model, lex = make_mw_task(tmp_path, with_mw_in_lm=False)
        lna = synth_lna(tmp_path, model, lex, ["ab_ca"], seed=6,
                        noise=0.2, name="mw4.lna")
        ref = run_reference_mw(ref_driver, tmp_path, lna, split=True)
        ours = run_ours_mw(tmp_path, lna, split=True, dense=True)
        assert ours == ref
