"""SLF lattice reading, rescoring and best-path tests."""

import numpy as np
import pytest

from aaltoasr_tpu.decoder.search import BeamSearch, SearchConfig
from aaltoasr_tpu.decoder.slf import SlfLattice
from aaltoasr_tpu.formats.arpa import read_arpa

from tests.test_decoder import ARPA_TEXT, make_decode_task, synth_obs


def decoded_lattice(lm_scale=1.0):
    model, tree, fsa = make_decode_task()
    obs = synth_obs(tree, model, ["_", "a", "b", "b", "a", "_"])
    bs = BeamSearch(tree, fsa, model,
                    SearchConfig(num_tokens=128, num_records=16,
                                 beam=1e9, lm_scale=lm_scale))
    res = bs.decode(obs)
    import io
    buf = io.StringIO()
    res.word_graph().write_slf(buf)
    return res, buf.getvalue()


class TestSlf:
    def test_read_round_trip(self):
        res, text = decoded_lattice()
        lat = SlfLattice.read(text)
        assert len(lat.arcs) > 0
        words, score = lat.best_path()
        assert words == res.words
        assert score == pytest.approx(res.log_prob, rel=1e-4)

    def test_rescore_same_lm_keeps_best_path(self):
        res, text = decoded_lattice()
        lat = SlfLattice.read(text)
        lm = read_arpa(ARPA_TEXT)
        out = lat.rescore(lm)
        words, score = out.best_path()
        assert words == res.words

    def test_rescore_changes_scores(self):
        res, text = decoded_lattice()
        lat = SlfLattice.read(text)
        # boosted LM strongly prefers 'kolme' after yksi
        boosted = ARPA_TEXT.replace("-0.2 yksi kaksi",
                                    "-9.0 yksi kaksi").replace(
            "-0.4 kolme yksi", "-0.4 kolme yksi\n-0.01 yksi kolme")
        lines = boosted.replace("ngram 2=6", "ngram 2=7")
        lm = read_arpa(lines)
        out = lat.rescore(lm)
        # the yksi->kaksi arc now carries the heavily penalized LM score
        penalized = [a for a in out.arcs if a["W"] == "kaksi"]
        assert penalized
        import math
        assert min(a["l"] for a in penalized) <= -9.0 * math.log(10) + 1
