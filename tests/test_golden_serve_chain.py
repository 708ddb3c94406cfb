"""True serve-chain golden at D=39 across BOTH implementations:

  wav -> MFCC+power+deltas features -> GMM state log-probs -> .lna
      -> token-pass decode -> 1-best words

The LNA produced by the built reference `phone_probs`
(`aku/phone_probs.cc:46-280`, `aku/PhoneProbsToolbox.cc:80-124`) is
compared quantum-by-quantum against ours on the SAME wav + model
(2-byte and 4-byte), and then both LNAs are decoded by both the built
reference decoder (`tools/ref_decode_driver.cc` over decoder/src) and
our engine, asserting identical 1-best word sequences
(`decode-stream.cc:1-33` is the reference's own serve chain).

The acoustic model is FIT to the audio: our feature generator runs on
`aku/tests/short.wav`, the frames are partitioned over the state
sequence of a known word string, and each state's Gaussian takes the
mean/variance of its frames — so the decode has a planted, meaningful
answer rather than noise.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.arpa import ArpaLM, write_arpa

sys.path.insert(0, os.path.dirname(__file__))

from test_golden_stats import aku_bins  # noqa: E402,F401
from test_golden_decode import (  # noqa: E402,F401
    ref_driver, run_ours, run_reference)

REF_WAV = "/root/reference/aku/tests/short.wav"
REF_CFG = "/root/reference/aku/tests/mfcc_p_dd.feaconf"

WORD_SEQ = ["aba", "ca"]
LEX = {"aba": ["a", "b", "a"], "bac": ["b", "a", "c"],
       "ca": ["c", "a"], "ab": ["a", "b"], "cab": ["c", "a", "b"]}


def build_task(tmp_path):
    """D=39 model fit to short.wav so it spells out WORD_SEQ."""
    import shutil
    shutil.copy(REF_WAV, tmp_path / "u.wav")
    shutil.copy(REF_CFG, tmp_path / "feats.cfg")

    from aaltoasr_tpu.frontend.audio import read_audio
    from aaltoasr_tpu.frontend.generator import FeatureGenerator
    gen = FeatureGenerator(str(tmp_path / "feats.cfg"))
    samples, _rate = read_audio(str(tmp_path / "u.wav"))
    feats = np.asarray(gen.features(samples), np.float64)
    T, D = feats.shape
    assert D == 39

    # states: a,b,c 3 each (0..8), '_' (9), '__' (10..12)
    phones = [model_io.HmmPhone("a", [0, 1, 2]),
              model_io.HmmPhone("b", [3, 4, 5]),
              model_io.HmmPhone("c", [6, 7, 8]),
              model_io.HmmPhone("_", [9]),
              model_io.HmmPhone("__", [10, 11, 12])]
    S = 13
    phone_states = {p.label: p.states for p in phones}

    # frame -> state assignment: leading/trailing silence around the
    # planted word sequence, evenly partitioned
    seq_states = []
    for w in WORD_SEQ:
        for ph in LEX[w]:
            seq_states.extend(phone_states[ph])
    sil = T // 8
    mid = T - 2 * sil
    assign = np.empty(T, np.int64)
    assign[:sil] = np.repeat([10, 11, 12], -(-sil // 3))[:sil]
    assign[T - sil:] = np.repeat([10, 11, 12], -(-sil // 3))[:sil]
    assign[sil:T - sil] = np.asarray(seq_states)[
        (np.arange(mid) * len(seq_states)) // mid]

    means = np.zeros((S, 39))
    covars = np.ones((S, 39))
    for s in range(S):
        sel = feats[assign == s]
        if s == 9:                       # '_' never assigned: wide
            means[s] = feats.mean(0)
            covars[s] = feats.var(0) * 4 + 1.0
            continue
        means[s] = sel.mean(0)
        covars[s] = sel.var(0) + 0.1
    model = model_io.HmmModel(
        dim=39, cov_type="diagonal_cov", means=means, covars=covars,
        mixtures=[(np.array([i], np.int32), np.array([1.0]))
                  for i in range(S)],
        phones=phones,
        transitions={i: [(0, 0.5), (1, 0.5)] for i in range(S)})
    model_io.write_model(str(tmp_path / "m"), model)
    # the decode helpers expect m.ph; write_model emits m.ph already

    lines = ["_ _", "__ __", "<s>(1.0)", "</s>(1.0)"] \
        + [f"{w} {' '.join(ps)}" for w, ps in LEX.items()]
    (tmp_path / "lex.dict").write_text("\n".join(lines) + "\n")

    words = sorted(LEX)
    vocab = ["</s>", "<s>"] + words
    wi = {w: i for i, w in enumerate(vocab)}
    uni = {(wi[w],): (-1.0, -0.5) for w in vocab}
    uni[(wi["<s>"],)] = (-99.0, -0.5)
    bi = {(wi[a], wi[b]): (-0.7, 0.0)
          for a in ["<s>"] + words for b in words + ["</s>"]}
    lm = ArpaLM(order=2, vocab=vocab, word_index=wi,
                ngrams=[{}, uni, bi])
    write_arpa(lm, str(tmp_path / "lm.arpa"))
    return model


def gen_lnas(aku_bins, tmp_path, lnabytes):
    env = dict(os.environ)
    tag = f"b{lnabytes}"
    (tmp_path / f"recipe.ref.{tag}").write_text(
        f"audio={tmp_path}/u.wav lna={tmp_path}/ref.{tag}.lna\n")
    (tmp_path / f"recipe.our.{tag}").write_text(
        f"audio={tmp_path}/u.wav lna={tmp_path}/our.{tag}.lna\n")
    subprocess.run(
        [os.path.join(aku_bins, "phone_probs"), "-b", "m",
         "-c", "feats.cfg", "-r", f"recipe.ref.{tag}",
         "--lnabytes", str(lnabytes)],
        cwd=tmp_path, check=True, capture_output=True,
        timeout=300, env=env)
    from aaltoasr_tpu.cli.phone_probs import main as pp_main
    prev = os.getcwd()
    os.chdir(tmp_path)
    try:
        pp_main(["-b", "m", "-c", "feats.cfg",
                 "-r", f"recipe.our.{tag}",
                 "--lnabytes", str(lnabytes)])
    finally:
        os.chdir(prev)
    return (str(tmp_path / f"ref.{tag}.lna"),
            str(tmp_path / f"our.{tag}.lna"))


class TestGoldenServeChain:
    def test_lna_parity_2byte(self, aku_bins, tmp_path):
        """2-byte LNAs agree quantum-for-quantum (|delta| <= 1 quantum,
        only at a small fraction of entries: the rebuilt reference's
        features differ from ours at ~2e-4 absolute — compiler-era
        float ordering, same tolerance as test_golden_stats — and one
        LNA quantum is 1/1820 in log-prob)."""
        build_task(tmp_path)
        ref_lna, our_lna = gen_lnas(aku_bins, tmp_path, 2)
        rb = open(ref_lna, "rb").read()
        ob = open(our_lna, "rb").read()
        assert rb[:5] == ob[:5]          # header: num_states + bytes
        r = np.frombuffer(rb[5:], ">u2").astype(np.int64)
        o = np.frombuffer(ob[5:], ">u2").astype(np.int64)
        assert r.shape == o.shape
        delta = np.abs(r - o)
        assert int(delta.max()) <= 1
        frac = float((delta != 0).mean())
        assert frac < 0.02, f"{frac:.4f} of quanta differ"

    def test_lna_parity_4byte(self, aku_bins, tmp_path):
        """4-byte (float) LNAs match to feature-noise tolerance."""
        build_task(tmp_path)
        ref_lna, our_lna = gen_lnas(aku_bins, tmp_path, 4)
        from aaltoasr_tpu.formats.lna import read_lna
        r, rb = read_lna(ref_lna)
        o, ob = read_lna(our_lna)
        assert rb == ob == 4
        assert r.shape == o.shape
        assert float(np.max(np.abs(r - o))) < 5e-3
        assert float(np.mean(np.abs(r - o))) < 2e-4

    def test_decode_1best_parity_both_lnas(self, aku_bins, ref_driver,
                                           tmp_path):
        """Both decoders on both implementations' LNAs: four identical
        1-bests, equal to the planted word sequence."""
        build_task(tmp_path)
        ref_lna, our_lna = gen_lnas(aku_bins, tmp_path, 2)
        # run_reference expects m.ph at tmp_path / "m.ph" (written by
        # write_model) and lex.dict / lm.arpa (written by build_task)
        results = {}
        for name, lna in [("ref", ref_lna), ("our", our_lna)]:
            results[("refdec", name)] = run_reference(
                ref_driver, tmp_path, lna, lm_scale=10.0, beam=400.0)
            results[("ourdec", name)] = run_ours(
                tmp_path, lna, lm_scale=10.0, beam=400.0)
        expect = WORD_SEQ
        for k, v in results.items():
            assert v == expect, (k, v)
