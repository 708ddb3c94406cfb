"""Cross-word TRIPHONE 1-best parity against the reference decoder.

The reference consumes a triphone-label lexicon (boundary contexts '_')
and rebuilds boundary phones through its fan-in/fan-out network; our
builder consumes the monophone lexicon and builds the equivalent
cross-word network itself — both must produce the same 1-best.
This suite keeps optional short silence off on both sides; the
oss-on cross-word operating point (the reference default) is covered
by tests/test_golden_crossword_battery.py.
"""

import subprocess

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.arpa import ArpaLM, write_arpa
from aaltoasr_tpu.formats.lna import write_lna

from tests.test_golden_decode import ref_driver  # fixture  # noqa: F401

PHONES = ["a", "b", "c"]
CTX = PHONES + ["_"]


def make_triphone_task(tmp_path, seed=0):
    rng = np.random.default_rng(seed)
    labels = [f"{x}-{y}+{z}" for y in PHONES for x in CTX for z in CTX]
    n_tri = len(labels)
    phone_list = [
        model_io.HmmPhone(lbl, [3 * i, 3 * i + 1, 3 * i + 2])
        for i, lbl in enumerate(labels)]
    S = 3 * n_tri
    phone_list.append(model_io.HmmPhone("_", [S]))
    phone_list.append(model_io.HmmPhone("__", [S + 1, S + 2, S + 3]))
    S += 4
    model = model_io.HmmModel(
        dim=1, cov_type="diagonal_cov",
        means=np.zeros((S, 1)), covars=np.ones((S, 1)),
        mixtures=[(np.array([i], np.int32), np.array([1.0]))
                  for i in range(S)],
        phones=phone_list,
        transitions={i: [(0, 0.5), (1, 0.5)] for i in range(S)})
    model_io.write_ph(str(tmp_path / "m.ph"), model)

    words = {"ab": ["a", "b"], "ba": ["b", "a"], "ca": ["c", "a"],
             "bc": ["b", "c"], "a": ["a"]}

    # reference lexicon: triphone labels with '_' boundary contexts
    ref_lines = ["_ _", "__ __", "<s>(1.0)", "</s>(1.0)"]
    for w, ps in words.items():
        toks = []
        for i, p in enumerate(ps):
            left = ps[i - 1] if i > 0 else "_"
            right = ps[i + 1] if i + 1 < len(ps) else "_"
            toks.append(f"{left}-{p}+{right}")
        ref_lines.append(f"{w} {' '.join(toks)}")
    (tmp_path / "ref_lex.dict").write_text("\n".join(ref_lines) + "\n")

    # our lexicon: monophone pronunciations (the cross-word builder
    # resolves contexts itself)
    our_lines = ["_ _", "__ __"] + [
        f"{w} {' '.join(ps)}" for w, ps in words.items()]
    (tmp_path / "our_lex.dict").write_text("\n".join(our_lines) + "\n")

    vocab = ["</s>", "<s>"] + sorted(words)
    wi = {w: i for i, w in enumerate(vocab)}
    uni = {(wi[w],): (-1.0, -0.5) for w in vocab}
    uni[(wi["<s>"],)] = (-99.0, -0.5)
    bi = {}
    for a in ["<s>"] + sorted(words):
        for b in sorted(words) + ["</s>"]:
            if rng.random() < 0.7:
                bi[(wi[a], wi[b])] = (
                    float(np.round(-0.2 - 1.2 * rng.random(), 4)), 0.0)
    write_arpa(ArpaLM(order=2, vocab=vocab, word_index=wi,
                      ngrams=[{}, uni, bi]), str(tmp_path / "lm.arpa"))
    label_id = {p.label: i for i, p in enumerate(model.phones)}
    return model, words, label_id


def synth_crossword_lna(tmp_path, model, words, label_id, word_seq,
                        seed, noise=0.8, fps=2, name="u.lna"):
    """LNA favoring the TRUE cross-word triphone state sequence."""
    rng = np.random.default_rng(seed)
    phone_of = {p.label: p for p in model.phones}
    # flat monophone string with word boundaries
    mono = []
    for w in word_seq:
        mono.extend(words[w])
    seq_states = list(phone_of["__"].states) * 2
    for i, p in enumerate(mono):
        left = mono[i - 1] if i > 0 else "_"
        right = mono[i + 1] if i + 1 < len(mono) else "_"
        lbl = f"{left}-{p}+{right}"
        for s in phone_of[lbl].states:
            seq_states.extend([s] * fps)
    seq_states += list(phone_of["__"].states) * 2
    T = len(seq_states)
    S = model.num_states
    lp = np.full((T, S), -8.0, np.float32)
    lp[np.arange(T), seq_states] = -0.4
    lp += noise * rng.standard_normal((T, S)).astype(np.float32)
    lp = lp - np.log(np.sum(np.exp(lp), axis=1, keepdims=True))
    write_lna(str(tmp_path / name), lp, lna_bytes=2)
    return str(tmp_path / name)


def run_ref(driver, tmp_path, lna, lm_scale=8.0, beam=500.0):
    out = subprocess.run(
        [driver, "--ph", str(tmp_path / "m.ph"),
         "--lex", str(tmp_path / "ref_lex.dict"),
         "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
         "--beam", str(beam), "--token-limit", "200000",
         "--lm-scale", str(lm_scale), "--dur-scale", "0",
         "--trans-scale", "1", "--no-oss"],
        check=True, capture_output=True, text=True, timeout=180)
    return [w for w in out.stdout.split()
            if w not in ("<s>", "</s>", "*")]


def run_ours(tmp_path, lna, lm_scale=8.0, beam=500.0, dense=False):
    from aaltoasr_tpu.decoder.toolbox import Toolbox
    t = Toolbox(str(tmp_path / "m.ph"))
    t.set_lm_scale(lm_scale)
    t.set_global_beam(beam)
    t.set_duration_scale(0.0)
    t.set_transition_scale(1.0)
    t.set_require_sentence_end(True)
    t.set_silence_is_word(False)
    t.lex_read(str(tmp_path / "our_lex.dict"))
    t.set_sentence_boundary("<s>", "</s>")
    t.ngram_read(str(tmp_path / "lm.arpa"))
    assert t.tree.root_pair_tgt.shape[0] > 1      # really cross-word
    if dense:
        from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch
        from aaltoasr_tpu.formats.lna import read_lna
        search = DenseBeamSearch(t.tree, t.lm, t.model, t.config)
        lp, _ = read_lna(lna)
        res = search.decode(lp)
    else:
        res = t.lna_decode(lna)
    return [w for w in res.words if w not in ("<s>", "</s>")]


class TestGoldenCrossword:
    def test_clean_crossword_identical(self, ref_driver, tmp_path):
        model, words, lid = make_triphone_task(tmp_path, seed=0)
        for i, seq in enumerate([["ab"], ["ca", "ba"], ["a", "bc"]]):
            lna = synth_crossword_lna(tmp_path, model, words, lid, seq,
                                      seed=50 + i, noise=0.4,
                                      name=f"x{i}.lna")
            ref = run_ref(ref_driver, tmp_path, lna)
            ours = run_ours(tmp_path, lna)
            assert ours == ref == seq, (seq, ref, ours)

    def test_noisy_crossword_mostly_identical(self, ref_driver,
                                              tmp_path):
        model, words, lid = make_triphone_task(tmp_path, seed=1)
        agree = 0
        n = 6
        for i in range(n):
            seq = [["ab"], ["ca", "ba"], ["bc"]][i % 3]
            lna = synth_crossword_lna(tmp_path, model, words, lid, seq,
                                      seed=80 + i, noise=1.6,
                                      name=f"y{i}.lna")
            ref = run_ref(ref_driver, tmp_path, lna)
            ours = run_ours(tmp_path, lna)
            if ref == ours:
                agree += 1
        assert agree >= n - 1, f"only {agree}/{n} identical"

    def test_dense_crossword_identical_clean(self, ref_driver,
                                             tmp_path):
        model, words, lid = make_triphone_task(tmp_path, seed=2)
        lna = synth_crossword_lna(tmp_path, model, words, lid,
                                  ["ca", "ba"], seed=99, noise=0.4,
                                  name="z.lna")
        ref = run_ref(ref_driver, tmp_path, lna)
        ours = run_ours(tmp_path, lna, dense=True)
        assert ours == ref
