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
        # rescored lattices carry an explicit sentence-end arc
        # (Rescore.cc appends one before expansion)
        assert [w for w in words if w != "</s>"] == res.words

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
        # the yksi->kaksi arc now carries the heavily penalized LM
        # score (SLF l fields are log10, base=10 header)
        penalized = [a for a in out.arcs if a["W"] == "kaksi"]
        assert penalized
        assert min(a["l"] for a in penalized) <= -9.0 + 0.5


class TestLatticeGrammar:
    SLF = """\
VERSION=1.0
N=5 L=6
I=0 t=0.0
I=1 t=0.1
I=2 t=0.2
I=3 t=0.3
I=4 t=0.4
J=0 S=0 E=1 W=!NULL a=0 l=0
J=1 S=1 E=2 W=yksi a=-1 l=-0.5
J=2 S=1 E=2 W=kaksi a=-2 l=-0.7
J=3 S=2 E=3 W=kolme a=-1 l=-0.2
J=4 S=2 E=4 W=kaksi a=-3 l=-0.9
J=5 S=3 E=4 W=!NULL a=0 l=0
"""

    def test_acceptor_semantics(self):
        """score 0 along lattice prefixes, dead otherwise
        (HTKLatticeGrammar::match_begin)."""
        from aaltoasr_tpu.decoder.slf import SlfLattice, lattice_grammar
        fsa = lattice_grammar(SlfLattice.read(self.SLF))
        w = fsa.word_index
        s = 0
        for word, ok in [("yksi", True), ("kolme", True),
                         ("yksi", False)]:
            s2, sc = fsa.walk(s, w[word])
            if ok:
                assert sc == 0.0
                s = s2
            else:
                assert sc < -1e20
        # branch: kaksi then kaksi is a path (1->2->4)
        s, sc = fsa.walk(0, w["kaksi"])
        assert sc == 0.0
        s, sc = fsa.walk(s, w["kaksi"])
        assert sc == 0.0
        # but kaksi kaksi kaksi is not
        _, sc = fsa.walk(s, w["kaksi"])
        assert sc < -1e20

    def test_constrained_decode(self):
        """The decoder restricted by a lattice grammar only emits
        lattice paths, even against the acoustics' preference."""
        from aaltoasr_tpu.decoder.search import BeamSearch, SearchConfig
        from aaltoasr_tpu.decoder.slf import SlfLattice, lattice_grammar
        from tests.test_decoder import make_decode_task, synth_obs
        model, tree, fsa = make_decode_task()
        # acoustics say "yksi kaksi" (a b b a)
        obs = synth_obs(tree, model, ["_", "a", "b", "b", "a", "_"])
        cfg = SearchConfig(num_tokens=256, beam=1e9, lm_scale=1.0,
                           duration_scale=0.0)
        words, _ = BeamSearch(tree, fsa, model, cfg).decode(obs)
        assert words == ["yksi", "kaksi"]
        # lattice only admits "kaksi kolme" / "kaksi yksi"
        slf = """\
VERSION=1.0
N=3 L=3
I=0 t=0.0
I=1 t=0.1
I=2 t=0.2
J=0 S=0 E=1 W=kaksi a=0 l=0
J=1 S=1 E=2 W=kolme a=0 l=0
J=2 S=1 E=2 W=yksi a=0 l=0
"""
        lg = lattice_grammar(SlfLattice.read(slf))
        words2, _ = BeamSearch(tree, lg, model, cfg).decode(obs)
        assert words2 and words2[0] == "kaksi"
        assert all(w in ("kaksi", "kolme", "yksi") for w in words2)
        assert words2 != words


class TestInterTreeGram:
    def test_interpolation_math(self):
        """ln P = ln(sum alpha_i P_i) with per-member backoff
        (InterTreeGram::log_prob)."""
        import math
        from aaltoasr_tpu.decoder.intergram import InterTreeGram
        from aaltoasr_tpu.formats.arpa import read_arpa
        from tests.test_decoder import ARPA_TEXT
        lm1 = read_arpa(ARPA_TEXT)
        lm2_text = """\
\\data\\
ngram 1=3

\\1-grams:
-0.3 yksi
-0.6 kaksi
-0.9 uusi

\\end\\
"""
        lm2 = read_arpa(lm2_text)
        inter = InterTreeGram([lm1, lm2], [0.7, 0.3])
        assert inter.order == 2
        w = inter.word_index
        # in-both word under a bigram context known only to lm1
        ctx = (w["yksi"],)
        got = inter.log_prob(ctx, w["kaksi"])
        p1 = math.exp(lm1.log_prob((lm1.word_index["yksi"],),
                                   lm1.word_index["kaksi"]))
        p2 = math.exp(lm2.log_prob((), lm2.word_index["kaksi"]))
        assert got == pytest.approx(math.log(0.7 * p1 + 0.3 * p2),
                                    abs=1e-9)
        # word only in lm2
        got2 = inter.log_prob((), w["uusi"])
        p2u = math.exp(lm2.log_prob((), lm2.word_index["uusi"]))
        assert got2 == pytest.approx(math.log(0.3 * p2u), abs=1e-9)

    def test_coeff_validation(self):
        from aaltoasr_tpu.decoder.intergram import InterTreeGram
        from aaltoasr_tpu.formats.arpa import read_arpa
        from tests.test_decoder import ARPA_TEXT
        lm = read_arpa(ARPA_TEXT)
        with pytest.raises(ValueError):
            InterTreeGram([lm, lm], [0.5, 0.1])

    def test_rescore_with_interpolated(self, tmp_path):
        """SlfLattice.rescore accepts the interpolated LM unchanged."""
        from aaltoasr_tpu.decoder.intergram import InterTreeGram
        from aaltoasr_tpu.formats.arpa import read_arpa
        from tests.test_decoder import ARPA_TEXT
        lm = read_arpa(ARPA_TEXT)
        inter = InterTreeGram([lm, lm], [0.5, 0.5])
        lat = SlfLattice.read(TestLatticeGrammar.SLF)
        out1 = lat.rescore(lm)
        out2 = lat.rescore(inter)
        w1, s1 = out1.best_path()
        w2, s2 = out2.best_path()
        # identical members -> identical interpolation
        assert w1 == w2
        assert s2 == pytest.approx(s1, abs=1e-4)


DIAMOND = """VERSION=1.0
lmscale=2.0 wdpenalty=0.0
start=0 end=4
N=5 L=6
I=0 t=0
I=1 t=1
I=2 t=1
I=3 t=2
I=4 t=3
J=0 S=0 E=1 W=a a=-1.0 l=-0.5
J=1 S=0 E=2 W=b a=-2.0 l=-0.1
J=2 S=1 E=3 W=c a=-1.0 l=-0.2
J=3 S=2 E=3 W=d a=-0.5 l=-0.3
J=4 S=3 E=4 W=!NULL a=0.0 l=0.0
J=5 S=1 E=4 W=e a=-3.0 l=-1.0
"""


class TestNbestOracle:
    def test_nbest_exact_order_and_scores(self):
        lat = SlfLattice.read(DIAMOND)
        nb = lat.nbest(5)
        bp = lat.best_path()
        assert nb[0][0] == bp[0]
        assert nb[0][1] == pytest.approx(bp[1])
        # all three distinct paths, in descending total-score order
        assert [w for w, _ in nb] == [["b", "d"], ["a", "c"], ["a", "e"]]
        scores = [s for _, s in nb]
        assert scores == sorted(scores, reverse=True)
        assert scores[0] == pytest.approx(-2.0 - 0.5 + 2.0 * (-0.1 - 0.3))

    def test_nbest_dedups_word_sequences(self):
        # two arcs with the same word between the same nodes
        text = DIAMOND + "J=6 S=1 E=3 W=c a=-5.0 l=-0.2\n"
        lat = SlfLattice.read(text)
        nb = lat.nbest(10)
        assert [w for w, _ in nb].count(["a", "c"]) == 1

    def test_oracle_error(self):
        lat = SlfLattice.read(DIAMOND)
        assert lat.oracle_error(["a", "c"]) == 0
        assert lat.oracle_error(["b", "d"]) == 0
        assert lat.oracle_error(["a", "x"]) == 1       # one sub
        assert lat.oracle_error(["a"]) == 1            # one insertion
        assert lat.oracle_error(["a", "c", "z"]) == 1  # one deletion
        assert lat.oracle_error([]) == 2
        assert lat.oracle_error(["x", "y", "z"]) == 3

    def test_nbest_on_decoded_lattice(self):
        res, text = decoded_lattice(lm_scale=1.0)
        lat = SlfLattice.read(text)
        nb = lat.nbest(5)
        ours = [w for w in res.words if w not in ("<s>", "</s>")]
        top = [w for w in nb[0][0] if w not in ("<s>", "</s>", "!NULL")]
        assert top == ours
