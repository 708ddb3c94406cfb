"""Larger-scale golden parity vs the reference C++ decoder: a 20-word
lexicon over 5 phones, bigram LM, longer multi-word utterances —
scales the cross-implementation evidence beyond the 5-word tasks."""

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.arpa import ArpaLM, write_arpa

from tests.test_golden_decode import (  # noqa: F401  (fixture)
    ref_driver, run_ours, run_reference, synth_lna)


def make_big_task(tmp_path, num_words=20, seed=4):
    rng = np.random.default_rng(seed)
    phones = ["a", "b", "c", "d", "e"]
    S = 3 * len(phones) + 4
    D = 1
    phone_list = [model_io.HmmPhone(p, [3 * i, 3 * i + 1, 3 * i + 2])
                  for i, p in enumerate(phones)]
    phone_list.append(model_io.HmmPhone("_", [15]))
    phone_list.append(model_io.HmmPhone("__", [16, 17, 18]))
    model = model_io.HmmModel(
        dim=D, cov_type="diagonal_cov",
        means=np.zeros((S, D)), covars=np.ones((S, D)),
        mixtures=[(np.array([i], np.int32), np.array([1.0]))
                  for i in range(S)],
        phones=phone_list,
        transitions={i: [(0, 0.5), (1, 0.5)] for i in range(S)})
    model_io.write_ph(str(tmp_path / "m.ph"), model)

    lex = {}
    seen = set()
    while len(lex) < num_words:
        n = int(rng.integers(2, 6))
        pron = tuple(phones[int(rng.integers(len(phones)))]
                     for _ in range(n))
        if pron in seen:
            continue
        seen.add(pron)
        lex[f"w{len(lex)}"] = list(pron)
    lines = ["_ _", "__ __", "<s>(1.0)", "</s>(1.0)"] \
        + [f"{w} {' '.join(ps)}" for w, ps in sorted(lex.items())]
    (tmp_path / "lex.dict").write_text("\n".join(lines) + "\n")

    words = sorted(lex)
    vocab = ["</s>", "<s>"] + words
    wi = {w: i for i, w in enumerate(vocab)}
    uni = {(wi[w],): (-1.4, -0.5) for w in vocab}
    uni[(wi["<s>"],)] = (-99.0, -0.5)
    bi = {}
    for a in ["<s>"] + words:
        for b in words + ["</s>"]:
            if rng.random() < 0.25:
                bi[(wi[a], wi[b])] = (
                    float(np.round(-0.2 - 1.5 * rng.random(), 4)), 0.0)
    lm = ArpaLM(order=2, vocab=vocab, word_index=wi,
                ngrams=[{}, uni, bi])
    write_arpa(lm, str(tmp_path / "lm.arpa"))
    return model, lex, wi


class TestGoldenScale:
    def test_40_word_lexicon_identical(self, ref_driver, tmp_path):
        model, lex, wi = make_big_task(tmp_path)
        rng = np.random.default_rng(9)
        words = sorted(lex)
        agree = total = 0
        for i in range(6):
            seq = [words[int(rng.integers(len(words)))]
                   for _ in range(int(rng.integers(3, 7)))]
            lna = synth_lna(tmp_path, model, lex, seq, seed=30 + i,
                            noise=0.4, frames_per_state=2,
                            name=f"s{i}.lna")
            ref = run_reference(ref_driver, tmp_path, lna,
                                beam=150.0, token_limit=20000)
            ours = run_ours(tmp_path, lna, beam=150.0)
            total += 1
            if ours == ref:
                agree += 1
        # clean-ish acoustics on a 40-word task: demand full agreement
        assert agree == total, f"{agree}/{total} identical"

    def test_dense_agrees_clean(self, ref_driver, tmp_path):
        model, lex, wi = make_big_task(tmp_path)
        words = sorted(lex)
        rng = np.random.default_rng(11)
        for i in range(3):
            seq = [words[int(rng.integers(len(words)))]
                   for _ in range(4)]
            lna = synth_lna(tmp_path, model, lex, seq, seed=50 + i,
                            noise=0.2, name=f"d{i}.lna")
            ref = run_reference(ref_driver, tmp_path, lna,
                                beam=150.0, token_limit=20000)
            ours = run_ours(tmp_path, lna, beam=150.0, dense=True)
            assert ours == ref, (seq, ref, ours)
