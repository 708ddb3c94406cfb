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

    def test_device_partial_matches_result(self):
        """partial() — device traceback + tiny id fetch — agrees with
        the host-traceback result() at every probe point."""
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model,
                        ["_", "a", "b", "b", "a", "c", "a", "_"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        sd = StreamingDecoder(bs)
        for t in range(obs.shape[0]):
            sd.push_frame(obs[t])
            if t % 5 == 4 or t == obs.shape[0] - 1:
                assert sd.partial() == sd.result().words
        assert sd.partial() == bs.decode(obs).words

    def test_device_partial_interleaves_with_flush(self):
        """partial() stays correct when the record spill has already
        flushed device rows to host (ring keeps its own copy)."""
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model, ["a", "b", "b", "a", "c", "a"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        sd = StreamingDecoder(bs, buffer_frames=8)  # force flushes
        got = []
        for t in range(obs.shape[0]):
            sd.push_frame(obs[t])
            if t % 7 == 6:
                got.append(sd.partial())
        assert sd.partial() == sd.result().words

    def test_device_partial_chunked_push(self):
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model, ["b", "a", "c", "a", "b"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        sd = StreamingDecoder(bs)
        K = 16
        for i in range(0, obs.shape[0], K):
            sd.push_frames(obs[i:i + K])
            assert sd.partial() == sd.result().words

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


class TestChunkedPush:
    def test_push_frames_matches_per_frame(self):
        """push_frames (one scan dispatch per block) is semantically
        identical to K push_frame calls — uneven blocks, a partial
        fetch mid-stream, and a spill boundary all included."""
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model, ["_", "a", "b", "b", "a", "_"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        off = bs.decode(obs)

        sd = StreamingDecoder(bs, buffer_frames=5)
        T = obs.shape[0]
        cuts = [0, 1, 4, 11, T]           # blocks of 1, 3, 7, rest
        for lo, hi in zip(cuts[:-1], cuts[1:]):
            sd.push_frames(obs[lo:hi])
            if lo == 4:                   # partial mid-stream
                assert isinstance(sd.result().words, list)
        assert sd.frame == T
        on = sd.result()
        assert on.words == off.words
        assert on.log_prob == pytest.approx(off.log_prob, rel=1e-5)

    def test_mixed_single_and_block_pushes(self):
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model, ["c", "a", "b", "b"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        off = bs.decode(obs)
        sd = StreamingDecoder(bs)
        sd.push_frame(obs[0])
        sd.push_frame(obs[1])
        sd.push_frames(obs[2:6])
        for t in range(6, obs.shape[0]):
            sd.push_frame(obs[t])
        on = sd.result()
        assert on.words == off.words
        assert on.log_prob == pytest.approx(off.log_prob, rel=1e-5)


class TestDecodeStreamCli:
    def test_end_to_end_plumbing(self, tmp_path, capsys, monkeypatch):
        """decode_stream consumes raw audio and prints a hypothesis
        line (decode-stream.cc pipeline)."""
        import numpy as np
        from aaltoasr_tpu.cli.decode_stream import main
        from aaltoasr_tpu.formats import model_io
        from tests.test_decoder import ARPA_TEXT

        model, tree, fsa = make_decode_task()
        model_io.write_model(str(tmp_path / "m"), model)
        (tmp_path / "lm.arpa").write_text(ARPA_TEXT)
        (tmp_path / "w.lex").write_text(
            "yksi a b\nkaksi b a\nkolme c a\n_ _\n")
        cfg = tmp_path / "f.cfg"
        cfg.write_text("""\
module
{
  name audio
  type audiofile
  sample_rate 16000
}
module
{
  name fft
  type fft
  sources audio
}
module
{
  name mel
  type mel
  sources fft
}
module
{
  name dct
  type dct
  sources mel
  dim 4
}
""")
        rng = np.random.default_rng(0)
        sig = (1200 * np.sin(2 * np.pi * 500
               * np.arange(9600) / 16000)
               + 100 * rng.standard_normal(9600)).astype("<i2")
        raw = tmp_path / "a.raw"
        raw.write_bytes(sig.tobytes())
        rc = main(["-b", str(tmp_path / "m"), "-c", str(cfg),
                   "-l", str(tmp_path / "w.lex"),
                   "-n", str(tmp_path / "lm.arpa"),
                   "--lm-scale", "1.0", "--partials",
                   str(raw)])
        assert rc == 0
        out = capsys.readouterr()
        assert out.out.endswith("\n")      # final hypothesis line
        assert "[" in out.err              # partial updates printed

        # the pipelined consumer: partials fetched every K frames,
        # pushes stay device-only in between
        rc = main(["-b", str(tmp_path / "m"), "-c", str(cfg),
                   "-l", str(tmp_path / "w.lex"),
                   "-n", str(tmp_path / "lm.arpa"),
                   "--lm-scale", "1.0", "--partial-every", "16",
                   str(raw)])
        assert rc == 0
        out2 = capsys.readouterr()
        assert out2.out.strip() == out.out.strip()   # same final 1-best
        assert "[" in out2.err


class TestStreamingSpill:
    def test_buffer_spill_matches_offline(self):
        """Device record buffers spill to host when full; the result
        across several spills equals offline decoding."""
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model, ["_", "a", "b", "b", "a", "_"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        off = bs.decode(obs)
        sd = StreamingDecoder(bs, buffer_frames=5)
        mid = []
        for t in range(obs.shape[0]):
            sd.push_frame(obs[t])
            if t % 7 == 6:                     # partials mid-spill
                mid.append(sd.result().words)
        on = sd.result()
        assert on.words == off.words
        assert on.log_prob == pytest.approx(off.log_prob, rel=1e-5)
        assert mid[-1] is not None
