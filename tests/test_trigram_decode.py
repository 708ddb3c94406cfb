"""Trigram (order-3) LM decoding: FSA walk + both searchers.

The FSA machinery handles arbitrary n-gram order (contexts of length
<= order-1, `order` unrolled backoff hops on device); everything else
in the repo is exercised with bigrams, so this pins down order-3:
host walk == ARPA backoff, device walk == host walk, and exact/dense
decoding == the brute-force DP oracle — on a task where a trigram
score flips the 1-best away from the bigram choice.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aaltoasr_tpu.decoder.lexicon import build_prefix_tree, read_lexicon
from aaltoasr_tpu.decoder.ngram import NGramFsa, lm_walk_device
from aaltoasr_tpu.decoder.search import BeamSearch, SearchConfig
from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch
from aaltoasr_tpu.formats.arpa import read_arpa
from aaltoasr_tpu.ops.logsemiring import LOG_ZERO

from tests.test_decoder import exact_decode, make_decode_task, synth_obs

TRIGRAM_ARPA = """\
\\data\\
ngram 1=5
ngram 2=7
ngram 3=4

\\1-grams:
-0.7 </s>
-99 <s> -0.6
-0.6 yksi -0.4
-0.5 kaksi -0.3
-0.9 kolme -0.2

\\2-grams:
-0.3 <s> yksi -0.2
-0.9 <s> kaksi -0.1
-0.2 yksi kaksi -0.3
-0.8 kaksi kolme -0.2
-0.4 kolme yksi -0.1
-0.5 kaksi </s>
-1.2 yksi kolme -0.1

\\3-grams:
-0.05 <s> yksi kaksi
-1.9 yksi kaksi kolme
-0.1 yksi kaksi </s>
-0.2 kaksi kolme yksi

\\end\\
"""


def trigram_task():
    model, tree, _ = make_decode_task()
    lm = read_arpa(TRIGRAM_ARPA)
    fsa = NGramFsa.from_arpa(lm)
    assert fsa.order == 3
    return model, tree, fsa, lm


class TestTrigramFsa:
    def test_walk_matches_arpa_backoff(self):
        _, _, fsa, lm = trigram_task()
        w = lm.word_index
        rng = np.random.default_rng(0)
        words = [w["yksi"], w["kaksi"], w["kolme"], w["</s>"]]
        for _ in range(40):
            seq = rng.choice(words, size=5)
            state = fsa.initial_state()
            ctx = (w["<s>"],)
            for word in seq:
                state2, score = fsa.walk(state, int(word))
                want = lm.log_prob(ctx, int(word))
                assert score == pytest.approx(want, abs=1e-5), (
                    ctx, word)
                ctx = (ctx + (int(word),))[-2:]
                state = state2

    def test_device_walk_matches_host(self):
        _, _, fsa, _ = trigram_task()
        tables = fsa.device_tables()
        rng = np.random.default_rng(1)
        states = rng.integers(0, fsa.num_states, 128).astype(np.int32)
        words = rng.integers(0, fsa.num_words, 128).astype(np.int32)
        nxt, sc = lm_walk_device(
            tables, fsa.num_words, fsa.order,
            jnp.asarray(states), jnp.asarray(words))
        for i in range(128):
            hn, hs = fsa.walk(int(states[i]), int(words[i]))
            assert int(nxt[i]) == hn, (states[i], words[i])
            if hs <= LOG_ZERO / 2:
                assert float(sc[i]) <= LOG_ZERO / 2
            else:
                assert float(sc[i]) == pytest.approx(hs, abs=1e-4)


class TestTrigramDecode:
    def _decode_all(self, obs, lm_scale):
        model, tree, fsa, _ = trigram_task()
        cfg = SearchConfig(num_tokens=256, num_records=16, beam=1e9,
                           lm_scale=lm_scale, duration_scale=0.0)
        exact = BeamSearch(tree, fsa, model, cfg)
        dense = DenseBeamSearch(tree, fsa, model, cfg)
        ids_o, tot_o = exact_decode(tree, fsa, obs, lm_scale)
        words_o = [tree.vocab[i] for i in ids_o]
        r_e = exact.decode(obs)
        r_d = dense.decode(obs)
        return (words_o, tot_o), r_e, r_d

    def test_matches_oracle(self):
        model, tree, fsa, _ = trigram_task()
        for seed, seq in [(0, ["a", "b", "b", "a", "_"]),
                          (1, ["a", "b", "c", "a"]),
                          (2, ["b", "a", "c", "a", "_"])]:
            obs = synth_obs(tree, model, seq, noise=0.5, seed=seed)
            (wo, to), r_e, r_d = self._decode_all(obs, lm_scale=1.0)
            assert r_e.words == wo, (seq, r_e.words, wo)
            assert r_e.log_prob == pytest.approx(to, rel=1e-4)
            assert r_d.words == wo, (seq, r_d.words, wo)

    def test_trigram_changes_the_answer(self):
        """With ambiguous acoustics after 'yksi kaksi', the strong
        penalty on the trigram 'yksi kaksi kolme' must steer the
        1-best — i.e. the decoder really uses order-3 context."""
        model, tree, fsa, lm = trigram_task()
        # acoustics: yksi kaksi then an ambiguous c/b phone then a
        obs = synth_obs(tree, model, ["a", "b", "b", "a"], noise=0.0,
                        seed=3)
        amb = synth_obs(tree, model, ["c", "a"], noise=0.0, seed=3)
        # mix the c evidence down so LM dominates the last word choice
        amb = amb * 0.2
        obs = np.concatenate([obs, amb])
        lm_scale = 8.0
        cfg = SearchConfig(num_tokens=256, num_records=16, beam=1e9,
                           lm_scale=lm_scale, duration_scale=0.0)
        exact = BeamSearch(tree, fsa, model, cfg)
        ids_o, _ = exact_decode(tree, fsa, obs, lm_scale)
        r = exact.decode(obs)
        assert r.words == [tree.vocab[i] for i in ids_o]
        # the bigram-only projection of the same LM picks 'kolme'
        # after 'kaksi' more eagerly: verify scores differ by exactly
        # the trigram correction on the oracle path
        w = lm.word_index
        ctx = (w["yksi"], w["kaksi"])
        tri = lm.log_prob(ctx, w["kolme"])
        bi = lm.log_prob(ctx[-1:], w["kolme"])
        assert abs(tri - bi) > 0.5  # the trigram really diverges
