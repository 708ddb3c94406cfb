"""Tests for batch_run, morpheus, perplexity, FST tools, word classes."""

import subprocess
import sys

import numpy as np
import pytest

from aaltoasr_tpu.decoder.classes import WordClasses
from aaltoasr_tpu.decoder.morpheus import Morpheus
from aaltoasr_tpu.formats.arpa import ArpaLM, read_arpa

from tests.test_decoder import ARPA_TEXT


MORPH_ARPA = """\
\\data\\
ngram 1=5

\\1-grams:
-0.5 </s>
-99 <s>
-0.5 talo
-0.7 ssa
-0.9 a

\\end\\
"""


class TestMorpheus:
    def test_segments_word(self):
        m = Morpheus(read_arpa(MORPH_ARPA))
        assert m.segment("talossa") == ["talo", "ssa"]
        assert m.segment("taloa") == ["talo", "a"]

    def test_unsegmentable_raises(self):
        m = Morpheus(read_arpa(MORPH_ARPA))
        with pytest.raises(ValueError):
            m.segment("xyz")

    def test_prefers_likely_split(self):
        # 'aa' splits as a+a; both orders same here, just must cover
        m = Morpheus(read_arpa(MORPH_ARPA))
        assert m.segment("aa") == ["a", "a"]


class TestWordClasses:
    def test_read_formats(self):
        wc = WordClasses.read("C1 0.5 hello\nC2 world\n")
        assert wc.membership["hello"][0] == "C1"
        assert wc.membership["hello"][1] == pytest.approx(np.log(0.5))
        assert wc.membership["world"] == ("C2", 0.0)

    def test_lm_word_names(self):
        wc = WordClasses.read("NUM 0.25 yksi\n")
        names = wc.lm_word_names(["yksi", "kaksi"])
        assert names == ["NUM", "kaksi"]


class TestBatchRun:
    def test_shards_and_retry(self, tmp_path):
        from aaltoasr_tpu.cli.batch_run import main as batch_main
        marker = tmp_path / "out"
        # a command that fails for shard 2 on the first attempt only
        script = tmp_path / "job.py"
        script.write_text(
            "import sys, os\n"
            f"d = {str(repr(str(tmp_path)))}\n"
            "i = sys.argv[1]\n"
            "flag = os.path.join(d, 'fail' + i)\n"
            "open(os.path.join(d, 'out' + i), 'a').write('x')\n"
            "if i == '2' and not os.path.exists(flag):\n"
            "    open(flag, 'w').write('1')\n"
            "    sys.exit(3)\n")
        rc = batch_main(["-B", "3", "--retries", "1",
                         "--failed-list",
                         str(tmp_path / "failed.lst"),
                         "--", sys.executable, str(script), "{I}"])
        assert rc == 0
        # shard 2 ran twice, others once
        assert (tmp_path / "out1").read_text() == "x"
        assert (tmp_path / "out2").read_text() == "xx"
        assert not (tmp_path / "failed.lst").exists()


class TestPerplexity:
    def test_computes(self, tmp_path, capsys):
        from aaltoasr_tpu.cli.perplexity import main as ppl_main
        lm_path = tmp_path / "lm.arpa"
        lm_path.write_text(ARPA_TEXT)
        text = tmp_path / "t.txt"
        text.write_text("yksi kaksi\n")
        rc = ppl_main(["-l", str(lm_path), str(text)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "perplexity:" in out


class TestFstTools:
    def test_lex2fst_and_hmm2fsm(self, tmp_path):
        from aaltoasr_tpu.cli.lex2fst import main as lex_main
        from aaltoasr_tpu.cli.hmm2fsm import main as hmm_main
        from aaltoasr_tpu.formats.fst import read_fst
        from aaltoasr_tpu.formats import model_io
        from tests.test_train import three_state_model
        lex = tmp_path / "lex"
        lex.write_text("yksi a b\nkaksi b a\n")
        out = tmp_path / "l.fst"
        lex_main([str(lex), "-o", str(out)])
        fst = read_fst(str(out))
        words = {a.out_label for a in fst.arcs if a.out_label}
        assert words == {"yksi", "kaksi"}

        model = three_state_model()
        model_io.write_model(str(tmp_path / "m"), model)
        out2 = tmp_path / "h.fst"
        hmm_main(["-b", str(tmp_path / "m"), "-o", str(out2)])
        fst2 = read_fst(str(out2))
        # transition-indexed arcs present for every model transition
        slots = {a.transition_index for a in fst2.arcs
                 if a.transition_index >= 0}
        assert slots == set(range(6))


class TestClskld:
    def test_kld_values(self, tmp_path, capsys):
        from aaltoasr_tpu.cli.clskld import main
        from aaltoasr_tpu.formats import model_io
        from tests.test_gmm import random_model
        import copy
        m1 = random_model(G=4, S=2, D=3, K=2, seed=0)
        m2 = copy.deepcopy(m1)
        m2.means = m1.means + 0.5
        model_io.write_model(str(tmp_path / "a"), m1)
        model_io.write_model(str(tmp_path / "b"), m2)
        rc = main(["--base1", str(tmp_path / "a"),
                   "--base2", str(tmp_path / "b"), "-m"])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 4
        want = 0.5 * (0.25 / m1.covars).sum(axis=1)
        np.testing.assert_allclose([float(x) for x in lines], want,
                                   rtol=1e-4)
        # identical models: zero Gaussian KLD
        rc = main(["--base1", str(tmp_path / "a"),
                   "--base2", str(tmp_path / "a"), "-g"])
        vals = [float(x) for x in
                capsys.readouterr().out.strip().splitlines()]
        np.testing.assert_allclose(vals, 0.0, atol=1e-6)
