"""Binary TreeGram (cis-binlm2) format tests."""

import numpy as np
import pytest

from aaltoasr_tpu.formats.arpa import read_arpa, write_arpa
from aaltoasr_tpu.formats.treegram_bin import read_bin, write_bin

from tests.test_decoder import ARPA_TEXT


class TestTreeGramBin:
    def test_round_trip(self, tmp_path):
        lm = read_arpa(ARPA_TEXT)
        p = tmp_path / "lm.bin"
        write_bin(lm, str(p))
        lm2 = read_bin(str(p))
        assert lm2.order == lm.order
        assert lm2.vocab == lm.vocab
        for o in range(1, lm.order + 1):
            assert set(lm2.ngrams[o]) == set(lm.ngrams[o])
            for g, (lp, bo) in lm.ngrams[o].items():
                lp2, bo2 = lm2.ngrams[o][g]
                assert lp2 == pytest.approx(lp, abs=1e-4)
                assert bo2 == pytest.approx(bo, abs=1e-4)

    def test_header(self, tmp_path):
        lm = read_arpa(ARPA_TEXT)
        p = tmp_path / "lm.bin"
        write_bin(lm, str(p))
        data = p.read_bytes()
        assert data.startswith(b"cis-binlm2\nbackoff\n")

    def test_scores_survive_via_arpa(self, tmp_path):
        """arpa2bin + bin2arpa is score-preserving (backoff queries)."""
        lm = read_arpa(ARPA_TEXT)
        pb = tmp_path / "lm.bin"
        pa = tmp_path / "lm2.arpa"
        write_bin(lm, str(pb))
        write_arpa(read_bin(str(pb)), str(pa))
        lm2 = read_arpa(str(pa))
        w = lm.word_index
        for ctx, word in [((w["yksi"],), w["kaksi"]),
                          ((w["yksi"],), w["kolme"]),
                          ((w["<s>"],), w["yksi"])]:
            assert lm2.log_prob(ctx, word) == pytest.approx(
                lm.log_prob(ctx, word), abs=1e-4)

    def test_toolbox_reads_binary(self, tmp_path):
        from aaltoasr_tpu.decoder.toolbox import Toolbox
        from aaltoasr_tpu.formats import model_io
        from tests.test_decoder import make_decode_task, synth_obs
        model, tree, fsa = make_decode_task()
        model_io.write_model(str(tmp_path / "m"), model)
        write_bin(read_arpa(ARPA_TEXT), str(tmp_path / "lm.bin"))
        t = Toolbox(str(tmp_path / "m.ph"))
        t.lex_read("yksi a b\nkaksi b a\nkolme c a\n_ _\n")
        t.ngram_read(str(tmp_path / "lm.bin"), binary=True)
        t.set_lm_scale(1.0)
        t.set_token_limit(128)
        obs = synth_obs(tree, model, ["_", "a", "b", "b", "a", "_"])
        res = t.decode(obs)
        assert res.words == ["yksi", "kaksi"]
