"""Streaming (push-model) decoding tests."""

import numpy as np
import pytest

from aaltoasr_tpu.decoder.search import (
    BeamSearch, SearchConfig, StreamingDecoder)

from tests.test_decoder import make_decode_task, synth_obs


class TestStreaming:
    def test_matches_offline(self):
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model, ["_", "a", "b", "b", "a", "_"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        off = bs.decode(obs)
        sd = StreamingDecoder(bs)
        for t in range(obs.shape[0]):
            sd.push_frame(obs[t])
        on = sd.result()
        assert on.words == off.words
        assert on.log_prob == pytest.approx(off.log_prob, rel=1e-5)

    def test_partial_results_monotone_frames(self):
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model, ["a", "b", "b", "a"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        sd = StreamingDecoder(bs)
        partials = []
        for t in range(obs.shape[0]):
            sd.push_frame(obs[t])
            if t in (3, 7, obs.shape[0] - 1):
                partials.append(sd.result().words)
        assert sd.frame == obs.shape[0]
        # final partial equals the full result
        assert partials[-1] == bs.decode(obs).words

    def test_reset_restarts(self):
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model, ["c", "a"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        sd = StreamingDecoder(bs)
        for t in range(obs.shape[0]):
            sd.push_frame(obs[t])
        first = sd.result().words
        sd.reset()
        for t in range(obs.shape[0]):
            sd.push_frame(obs[t])
        assert sd.result().words == first
