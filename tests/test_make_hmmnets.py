"""Denominator hmmnet generation tests (create_hmmnets.pl parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

from aaltoasr_tpu.decoder.lexicon import read_lexicon
from aaltoasr_tpu.decoder.wordgraph import WGArc, WGNode, WordGraph
from aaltoasr_tpu.models.hmm import TransitionTable
from aaltoasr_tpu.models.hmmnet import (
    compile_hmmnet, pad_hmmnet, transcript_hmmnet, union_fst,
    wordgraph_hmmnet)
from aaltoasr_tpu.ops.gmm import GmmScorer
from aaltoasr_tpu.ops.logsemiring import logsumexp
from aaltoasr_tpu.train import estep

from tests.test_decoder import make_decode_task, synth_obs


def fb_total(model, fst, feats):
    table = TransitionTable.from_model(model)
    g, _ = compile_hmmnet(fst, table)
    gp = {k: jnp.asarray(v) for k, v in
          pad_hmmnet(g, int(g["num_positions"]), 4).items()}
    scorer = GmmScorer.from_model(model)
    gll = scorer.gaussian_log_likelihoods(jnp.asarray(feats))
    sll = logsumexp(gll[:, scorer.comp_idx] + scorer.comp_logw, axis=-1)
    obs = sll[:, gp["pdf"]] + gp["obs_const"][None, :]
    T = feats.shape[0]
    _, _, total = estep.masked_forward_backward(
        obs, gp, jnp.int32(T), table.num_slots)
    return float(total)


def synth_feats(model, phone_seq, frames_per_phone=3, seed=0):
    rng = np.random.default_rng(seed)
    pid = {p.label: i for i, p in enumerate(model.phones)}
    rows = []
    for ph in phone_seq:
        for _ in range(frames_per_phone):
            rows.append(model.means[pid[ph]]
                        + 0.3 * rng.standard_normal(model.dim))
    return np.asarray(rows, dtype=np.float32)


class TestUnionFst:
    def test_union_total_is_logsumexp(self):
        """FB total over a union = logaddexp of the branch totals."""
        model, _, _ = make_decode_task()
        table = TransitionTable.from_model(model)
        a = transcript_hmmnet(model, table, ["a", "b"],
                              optional_silence="")
        b = transcript_hmmnet(model, table, ["b", "a"],
                              optional_silence="")
        feats = synth_feats(model, ["a", "b"], frames_per_phone=2)
        ta = fb_total(model, a, feats)
        tb = fb_total(model, b, feats)
        tu = fb_total(model, union_fst(a, b), feats)
        assert tu == pytest.approx(np.logaddexp(ta, tb), abs=1e-3)


class TestWordGraphHmmnet:
    def _graph(self):
        g = WordGraph(lm_scale=1.0)
        g.nodes = [WGNode(0, 0), WGNode(1, 3), WGNode(2, 6)]
        g.arcs = [WGArc(0, 1, "yksi", -10.0, -0.3),
                  WGArc(0, 1, "kaksi", -12.0, -0.9),
                  WGArc(1, 2, "kolme", -11.0, -0.8)]
        g.start_node, g.end_node = 0, 2
        return g

    def test_expansion_scores_paths(self):
        """The expanded net accepts exactly the lattice's word paths,
        with the scaled LM score as a static arc score."""
        model, _, _ = make_decode_task()
        table = TransitionTable.from_model(model)
        lex = read_lexicon("yksi a b\nkaksi b a\nkolme c a\n_ _\n")
        fst = wordgraph_hmmnet(model, table, lex, self._graph())
        # yksi kolme = phones a b c a -> acoustics matching that path
        feats = synth_feats(model, ["a", "b", "c", "a"])
        t1 = fb_total(model, fst, feats)
        assert np.isfinite(t1) and t1 > -1e29
        # a path NOT in the lattice (kolme alone = c a) must be dead
        feats_bad = synth_feats(model, ["c", "a"])
        t2 = fb_total(model, fst, feats_bad)
        # not strictly -inf (mismatched acoustics still have density)
        # but the matched path must dominate clearly
        assert t1 > t2

        # LM scores are static: shifting all lm scores by delta shifts
        # the total by lm_scale * delta for a single surviving path
        g2 = self._graph()
        for arc in g2.arcs:
            arc.lm -= 2.0
        fst2 = wordgraph_hmmnet(model, table, lex, g2)
        t3 = fb_total(model, fst2, feats)
        assert t3 == pytest.approx(t1 - 4.0, abs=0.15)  # 2 words deep

    def test_posterior_prune_drops_weak_arc(self):
        model, _, _ = make_decode_task()
        table = TransitionTable.from_model(model)
        lex = read_lexicon("yksi a b\nkaksi b a\nkolme c a\n_ _\n")
        g = self._graph()
        g.arcs[1].am = -200.0         # kaksi hopeless
        fst = wordgraph_hmmnet(model, table, lex, g,
                               posterior_prune=0.01)
        # only yksi+kolme and kolme arcs remain: 3 phones' worth of
        # emitting arcs fewer than the unpruned net
        full = wordgraph_hmmnet(model, table, lex, g)
        n_emit = lambda f: sum(1 for a in f.arcs
                               if a.transition_index != -1)
        assert n_emit(fst) < n_emit(full)

    def test_unknown_word_passes_as_eps(self):
        """Words absent from lexicon and phone list (e.g. <s>) become
        weighted epsilon arcs rather than errors."""
        model, _, _ = make_decode_task()
        table = TransitionTable.from_model(model)
        lex = read_lexicon("yksi a b\n")
        g = WordGraph(lm_scale=1.0)
        g.nodes = [WGNode(0, 0), WGNode(1, 0), WGNode(2, 3)]
        g.arcs = [WGArc(0, 1, "<s>", 0.0, -0.1),
                  WGArc(1, 2, "yksi", -10.0, -0.3)]
        g.start_node, g.end_node = 0, 2
        fst = wordgraph_hmmnet(model, table, lex, g)
        feats = synth_feats(model, ["a", "b"])
        assert np.isfinite(fb_total(model, fst, feats))


class TestMakeHmmnetsCli:
    def test_end_to_end_with_mpe_stats(self, tmp_path, monkeypatch):
        """make_hmmnets -d writes consumable num/den networks: the
        generated files feed stats --mpe without error."""
        import wave
        from aaltoasr_tpu.cli.make_hmmnets import main as mh_main
        from aaltoasr_tpu.cli.stats import main as stats_main
        from aaltoasr_tpu.formats import model_io
        from aaltoasr_tpu.formats.arpa import write_arpa, read_arpa
        from tests.test_decoder import ARPA_TEXT

        model, _, _ = make_decode_task()
        model_io.write_model(str(tmp_path / "m"), model)
        (tmp_path / "lm.arpa").write_text(ARPA_TEXT)
        (tmp_path / "words.lex").write_text(
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
        # model dim is 4: dct dim 4 matches
        rng = np.random.default_rng(0)
        sig = (1500 * np.sin(2 * np.pi * 400 * np.arange(4000) / 16000)
               + 150 * rng.standard_normal(4000)).astype("<i2")
        wav = tmp_path / "u0.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(sig.tobytes())
        (tmp_path / "u0.phn").write_text("a\nb\n")
        rec = tmp_path / "t.recipe"
        rec.write_text(
            f"audio={wav} transcript={tmp_path}/u0.phn "
            f"hmmnet={tmp_path}/u0.num.fst "
            f"den-hmmnet={tmp_path}/u0.den.fst\n")

        rc = mh_main(["-b", str(tmp_path / "m"), "-c", str(cfg),
                      "-r", str(rec), "-d",
                      "--lm", str(tmp_path / "lm.arpa"),
                      "--lexicon", str(tmp_path / "words.lex"),
                      "--lm-scale", "1.0", "--beam", "1e9"])
        assert rc == 0
        assert (tmp_path / "u0.num.fst").exists()
        assert (tmp_path / "u0.den.fst").exists()

        rc = stats_main(["-b", str(tmp_path / "m"), "-c", str(cfg),
                         "-r", str(rec), "-o", str(tmp_path / "s0"),
                         "-H", "--mpe"])
        assert rc == 0
        assert (tmp_path / "s0.gks").exists()


class TestTrainEbwCli:
    def test_loop_and_resume(self, tmp_path):
        """train_ebw runs EBW iterations over generated networks and
        resumes by skipping existing outputs (train_ebw.pl)."""
        import wave
        from aaltoasr_tpu.cli.make_hmmnets import main as mh_main
        from aaltoasr_tpu.cli.train_ebw import main as te_main
        from aaltoasr_tpu.formats import model_io
        from tests.test_decoder import ARPA_TEXT

        model, _, _ = make_decode_task()
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
        rng = np.random.default_rng(1)
        sig = (1500 * np.sin(2 * np.pi * 350 * np.arange(4000) / 16000)
               + 150 * rng.standard_normal(4000)).astype("<i2")
        wav = tmp_path / "u0.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(sig.tobytes())
        (tmp_path / "u0.phn").write_text("a\nb\n")
        rec = tmp_path / "t.recipe"
        rec.write_text(
            f"audio={wav} transcript={tmp_path}/u0.phn "
            f"hmmnet={tmp_path}/u0.num.fst "
            f"den-hmmnet={tmp_path}/u0.den.fst\n")
        rc = te_main(["-b", str(tmp_path / "m"), "-c", str(cfg),
                      "-r", str(rec), "-w", str(tmp_path / "w"),
                      "--make-hmmnets", "--lm",
                      str(tmp_path / "lm.arpa"), "--lexicon",
                      str(tmp_path / "w.lex"), "--lm-scale", "1.0",
                      "--num-iters", "2", "--ismooth", "5"])
        assert rc == 0
        assert (tmp_path / "w" / "ebw_2.ph").exists()
        summary = (tmp_path / "w" / "ebw.summary").read_text()
        assert summary.count("\n") == 2   # one line per iteration
        # resume: second invocation skips both iterations
        rc = te_main(["-b", str(tmp_path / "m"), "-c", str(cfg),
                      "-r", str(rec), "-w", str(tmp_path / "w"),
                      "--num-iters", "2"])
        assert rc == 0
        assert (tmp_path / "w" / "ebw.summary").read_text() == summary
