"""Dense fast decoder tests: agreement with the exact searcher."""

import numpy as np
import pytest

from aaltoasr_tpu.decoder.search import BeamSearch, SearchConfig
from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch

from tests.test_decoder import make_decode_task, synth_obs


class TestDenseSearch:
    def _pair(self, cfg=None):
        model, tree, fsa = make_decode_task()
        # require_sentence_end matches rectool's always-on default
        # (rectool.py:537); it also selects the dense engine's exact
        # finalize (the snap fast path keeps the exit-based convention
        # at the final frame and may drop a word that ends exactly at
        # the last observation)
        cfg = cfg or SearchConfig(num_tokens=256, num_records=16,
                                  beam=1e9, lm_scale=1.0,
                                  require_sentence_end=True)
        return (model, tree, fsa,
                BeamSearch(tree, fsa, model, cfg),
                DenseBeamSearch(tree, fsa, model, cfg))

    def test_matches_exact_on_clear_acoustics(self):
        model, tree, fsa, exact, dense = self._pair()
        for seed, seq in [(0, ["_", "a", "b", "b", "a", "_"]),
                          (1, ["c", "a", "a", "b"]),
                          (2, ["b", "a", "c", "a"])]:
            obs = synth_obs(tree, model, seq, noise=0.5, seed=seed)
            r1 = exact.decode(obs)
            r2 = dense.decode(obs)
            assert r2.words == r1.words, seq
            assert r2.log_prob == pytest.approx(r1.log_prob, rel=1e-4)

    def test_close_on_noisy_acoustics(self):
        model, tree, fsa, exact, dense = self._pair()
        agree = 0
        for seed in range(6):
            obs = synth_obs(tree, model, ["a", "b", "b", "a"],
                            noise=2.5, seed=seed)
            r1 = exact.decode(obs)
            r2 = dense.decode(obs)
            # dense is an approximation: score can only be <= exact
            assert r2.log_prob <= r1.log_prob + 1e-3
            if r2.words == r1.words:
                agree += 1
        assert agree >= 4  # mostly identical

    def test_batch_matches_single(self):
        model, tree, fsa, exact, dense = self._pair()
        obs1 = synth_obs(tree, model, ["a", "b", "_"], seed=3)
        obs2 = synth_obs(tree, model, ["c", "a"], seed=4)
        r1 = dense.decode(obs1)
        r2 = dense.decode(obs2)
        T = max(obs1.shape[0], obs2.shape[0])
        pad = np.full((2, T, obs1.shape[1]), -100.0, dtype=np.float32)
        pad[0, :obs1.shape[0]] = obs1
        pad[1, :obs2.shape[0]] = obs2
        out = dense.decode_batch(pad, np.array([obs1.shape[0],
                                                obs2.shape[0]]))
        assert out[0].words == r1.words
        assert out[1].words == r2.words
        assert out[0].log_prob == pytest.approx(r1.log_prob, rel=1e-5)

    def test_lattice_output_works(self):
        model, tree, fsa, exact, dense = self._pair()
        obs = synth_obs(tree, model, ["_", "a", "b", "b", "a", "_"])
        res = dense.decode(obs)
        nb = res.word_graph().nbest(3)
        assert nb[0][0] == res.words
        assert nb[0][1] == pytest.approx(res.log_prob, rel=1e-4)


class TestDenseCrossword:
    def _task(self):
        from tests.test_decoder import TestCrossWordTriphones
        return TestCrossWordTriphones()._make()

    def test_crossword_matches_exact(self):
        """Dense mode accepts cross-word fan-in/fan-out trees and
        reproduces the exact searcher's 1-best + score on consistent
        acoustics (pair-row re-entry, TPLexPrefixTree.hh:172-240)."""
        from aaltoasr_tpu.decoder.lexicon import build_prefix_tree
        from aaltoasr_tpu.ops.gmm import GmmScorer
        import jax.numpy as jnp
        model, lex, fsa, lid = self._task()
        tree = build_prefix_tree(model, lex)
        assert tree.root_pair_tgt.shape[0] > 1      # really cross-word
        cfg = SearchConfig(num_tokens=256, num_records=16, beam=1e9,
                           lm_scale=1.0, duration_scale=0.0)
        exact = BeamSearch(tree, fsa, model, cfg)
        dense = DenseBeamSearch(tree, fsa, model, cfg)
        scorer = GmmScorer.from_model(model)
        rng = np.random.default_rng(12)
        seq = (["_"] + ["_-a+b"] * 3 + ["a-b+_"] * 3 + ["_"] * 2)
        X = np.stack([model.means[lid[l]]
                      + 0.2 * rng.standard_normal(model.dim)
                      for l in seq]).astype(np.float32)
        obs = np.asarray(scorer.state_log_likelihoods(
            jnp.asarray(X)))[:, :model.num_states]
        r_exact = exact.decode(obs)
        r_dense = dense.decode(obs)
        assert r_dense.words == r_exact.words == ["xa", "xb"]
        assert r_dense.log_prob == pytest.approx(r_exact.log_prob,
                                                 rel=1e-4)

    def test_crossword_noisy_close(self):
        from aaltoasr_tpu.decoder.lexicon import build_prefix_tree
        from aaltoasr_tpu.ops.gmm import GmmScorer
        import jax.numpy as jnp
        model, lex, fsa, lid = self._task()
        tree = build_prefix_tree(model, lex)
        cfg = SearchConfig(num_tokens=256, num_records=16, beam=1e9,
                           lm_scale=1.0, duration_scale=0.0)
        exact = BeamSearch(tree, fsa, model, cfg)
        dense = DenseBeamSearch(tree, fsa, model, cfg)
        scorer = GmmScorer.from_model(model)
        agree = 0
        for seed in range(5):
            rng = np.random.default_rng(100 + seed)
            seq = (["_"] + ["_-a+b"] * 3 + ["a-b+_"] * 3 + ["_"] * 2)
            X = np.stack([model.means[lid[l]]
                          + 1.5 * rng.standard_normal(model.dim)
                          for l in seq]).astype(np.float32)
            obs = np.asarray(scorer.state_log_likelihoods(
                jnp.asarray(X)))[:, :model.num_states]
            r1 = exact.decode(obs)
            r2 = dense.decode(obs)
            assert r2.log_prob <= r1.log_prob + 1e-3
            if r2.words == r1.words:
                agree += 1
        assert agree >= 3


class TestDeviceTraceback:
    """lattice=False: 1-best traceback runs on device; only the word
    chain crosses the wire (record stacks stay on device)."""

    def test_matches_record_traceback(self):
        model, tree, fsa = make_decode_task()
        cfg = SearchConfig(num_tokens=256, num_records=16,
                           beam=1e9, lm_scale=1.0)
        dense = DenseBeamSearch(tree, fsa, model, cfg)
        obs1 = synth_obs(tree, model, ["a", "b", "b", "a", "_"], seed=5)
        obs2 = synth_obs(tree, model, ["c", "a", "b"], seed=6)
        T = max(obs1.shape[0], obs2.shape[0])
        pad = np.full((2, T, obs1.shape[1]), -100.0, dtype=np.float32)
        pad[0, :obs1.shape[0]] = obs1
        pad[1, :obs2.shape[0]] = obs2
        n = np.array([obs1.shape[0], obs2.shape[0]])
        full = dense.decode_batch(pad, n, lattice=True)
        fast = dense.decode_batch(pad, n, lattice=False)
        for a, b in zip(full, fast):
            assert len(a.words) > 0
            assert b.words == a.words
            assert b.log_prob == pytest.approx(a.log_prob, rel=1e-5)
        single = dense.decode(obs1, lattice=False)
        assert single.words == full[0].words
        with pytest.raises(RuntimeError):
            fast[0].word_graph()

    def test_exact_engine_device_traceback(self):
        model, tree, fsa = make_decode_task()
        cfg = SearchConfig(num_tokens=256, num_records=16,
                           beam=1e9, lm_scale=1.0,
                           require_sentence_end=True)
        exact = BeamSearch(tree, fsa, model, cfg)
        obs1 = synth_obs(tree, model, ["a", "b", "b", "a", "_"], seed=5)
        obs2 = synth_obs(tree, model, ["c", "a", "b"], seed=6)
        T = max(obs1.shape[0], obs2.shape[0])
        pad = np.full((2, T, obs1.shape[1]), -100.0, dtype=np.float32)
        pad[0, :obs1.shape[0]] = obs1
        pad[1, :obs2.shape[0]] = obs2
        n = np.array([obs1.shape[0], obs2.shape[0]])
        full = exact.decode_batch(pad, n)
        fast = exact.decode_batch(pad, n, lattice=False)
        for a, b in zip(full, fast):
            assert len(a.words) > 0
            assert b.words == a.words
            assert b.log_prob == pytest.approx(a.log_prob, rel=1e-5)
        single = exact.decode(obs1, lattice=False)
        assert single.words == full[0].words

    def test_long_utterance_word_chain_beyond_512(self):
        """The 1-best chain cap scales with T: a long utterance can
        commit more than 512 words (regression: fixed cap truncated)."""
        model, tree, fsa = make_decode_task()
        cfg = SearchConfig(num_tokens=256, num_records=16,
                           beam=1e9, lm_scale=0.01)
        dense = DenseBeamSearch(tree, fsa, model, cfg)
        reps = 560
        obs = synth_obs(tree, model, ["a", "b"] * reps,
                        frames_per_phone=1, noise=0.1, seed=9)
        full = dense.decode(obs, lattice=True)
        fast = dense.decode(obs, lattice=False)
        assert len(full.words) > 512
        assert fast.words == full.words
