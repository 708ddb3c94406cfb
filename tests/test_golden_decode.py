"""Cross-implementation 1-best parity against the REFERENCE C++
decoder (decoder/src/Toolbox, driven by tools/ref_decode_driver.cc).

The reference decoder builds without lapackpp; the fixture compiles it
out-of-source into build/ (skipped when the toolchain or reference tree
is unavailable).  A self-contained synthetic task — model (.ph),
lexicon, ARPA bigram, LNA files all written by aaltoasr_tpu's format
layer — is decoded by both implementations and the 1-best word
sequences are compared.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.arpa import ArpaLM, write_arpa
from aaltoasr_tpu.formats.lna import write_lna

REF = "/root/reference/decoder"
BUILD = os.path.join(os.path.dirname(__file__), "..", "build")
DRIVER = os.path.join(BUILD, "ref_decode_driver")


@pytest.fixture(scope="session")
def ref_driver():
    if os.path.exists(DRIVER):
        return DRIVER
    if not (os.path.isdir(REF) and shutil.which("cmake")
            and shutil.which("g++")):
        pytest.skip("reference decoder tree or toolchain unavailable")
    bdir = os.path.join(BUILD, "refdecoder")
    os.makedirs(bdir, exist_ok=True)
    try:
        subprocess.run(
            ["cmake", "-DDISABLE_SWIG=1", "-DCMAKE_BUILD_TYPE=Release",
             REF, "-G", "Unix Makefiles"],
            cwd=bdir, check=True, capture_output=True, timeout=300)
        subprocess.run(["make", "-j4", "decoder", "fsalm", "misc"],
                       cwd=bdir, check=True, capture_output=True,
                       timeout=600)
        subprocess.run(
            ["g++", "-O2", "-std=gnu++0x", f"-I{REF}/src",
             f"-I{REF}/src/misc",
             os.path.join(os.path.dirname(__file__), "..", "tools",
                          "ref_decode_driver.cc"),
             "-o", DRIVER, f"-L{bdir}/src", f"-L{bdir}/src/fsalm",
             f"-L{bdir}/src/misc", "-ldecoder", "-lfsalm", "-lmisc"],
            check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError,
            subprocess.TimeoutExpired) as e:
        pytest.skip(f"reference decoder build failed: {e}")
    return DRIVER


def make_task(tmp_path, seed=0):
    """Monophone model + lexicon + bigram ARPA on disk."""
    rng = np.random.default_rng(seed)
    # reference silence conventions (TPLexPrefixTree.cc:132-144):
    # '_' = 1-state short silence, '__' = long silence
    phones = ["a", "b", "c"]
    S = 3 * len(phones) + 4
    D = 1
    phone_list = [model_io.HmmPhone(p, [3 * i, 3 * i + 1, 3 * i + 2])
                  for i, p in enumerate(phones)]
    phone_list.append(model_io.HmmPhone("_", [9]))
    phone_list.append(model_io.HmmPhone("__", [10, 11, 12]))
    model = model_io.HmmModel(
        dim=D, cov_type="diagonal_cov",
        means=np.zeros((S, D)), covars=np.ones((S, D)),
        mixtures=[(np.array([i], np.int32), np.array([1.0]))
                  for i in range(S)],
        phones=phone_list,
        transitions={i: [(0, 0.5), (1, 0.5)] for i in range(S)})
    model_io.write_ph(str(tmp_path / "m.ph"), model)

    lex = {"aba": ["a", "b", "a"], "bac": ["b", "a", "c"],
           "ca": ["c", "a"], "ab": ["a", "b"], "cab": ["c", "a", "b"]}
    # sentence-boundary words must exist in the decoder vocabulary
    # (Toolbox::set_sentence_boundary throws otherwise)
    # empty pronunciations put the boundary words in the vocabulary
    # without tree paths (fin_voc.lex:3-4 convention)
    lines = ["_ _", "__ __", "<s>(1.0)", "</s>(1.0)"] \
        + [f"{w} {' '.join(ps)}" for w, ps in lex.items()]
    (tmp_path / "lex.dict").write_text("\n".join(lines) + "\n")

    words = sorted(lex)
    vocab = ["</s>", "<s>"] + words
    wi = {w: i for i, w in enumerate(vocab)}
    uni = {(wi[w],): (-1.0, -0.5) for w in vocab}
    uni[(wi["<s>"],)] = (-99.0, -0.5)
    bi = {}
    for a in ["<s>"] + words:
        for b in words + ["</s>"]:
            if rng.random() < 0.6:
                bi[(wi[a], wi[b])] = (
                    float(np.round(-0.2 - 1.5 * rng.random(), 4)), 0.0)
    lm = ArpaLM(order=2, vocab=vocab, word_index=wi,
                ngrams=[{}, uni, bi])
    write_arpa(lm, str(tmp_path / "lm.arpa"))
    return model, lex, wi


def synth_lna(tmp_path, model, lex, word_seq, seed, noise=1.0,
              frames_per_state=2, name="u.lna"):
    """LNA whose log-probs favor the states of word_seq's phones."""
    rng = np.random.default_rng(seed)
    S = model.num_states
    seq_states = []
    phone_of = {p.label: p for p in model.phones}
    for w in word_seq:
        for ph in (lex[w] if w in lex else [w]):
            for s in phone_of[ph].states:
                seq_states.extend([s] * frames_per_state)
    # leading/trailing silence (long silence model)
    sil = phone_of["__"].states
    seq_states = ([s for s in sil for _ in range(2)] + seq_states
                  + [s for s in sil for _ in range(2)])
    T = len(seq_states)
    lp = np.full((T, S), -8.0, np.float32)
    lp[np.arange(T), seq_states] = -0.5
    lp += noise * rng.standard_normal((T, S)).astype(np.float32)
    # normalized like phone_probs output
    lp = lp - np.log(np.sum(np.exp(lp), axis=1, keepdims=True))
    write_lna(str(tmp_path / name), lp, lna_bytes=2)
    return str(tmp_path / name)


def run_reference(driver, tmp_path, lna, lm_scale=10.0, beam=400.0,
                  token_limit=100000):
    out = subprocess.run(
        [driver, "--ph", str(tmp_path / "m.ph"),
         "--lex", str(tmp_path / "lex.dict"),
         "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
         "--beam", str(beam), "--token-limit", str(token_limit),
         "--lm-scale", str(lm_scale), "--dur-scale", "0",
         "--trans-scale", "1", "--no-crossword"],
        check=True, capture_output=True, text=True, timeout=300)
    words = [w for w in out.stdout.split()
             if w not in ("<s>", "</s>", "*")]
    return words


def run_ours(tmp_path, lna, lm_scale=10.0, beam=400.0, dense=False):
    from aaltoasr_tpu.decoder.toolbox import Toolbox
    t = Toolbox(str(tmp_path / "m.ph"))
    t.set_lm_scale(lm_scale)
    t.set_global_beam(beam)
    t.set_duration_scale(0.0)
    t.set_transition_scale(1.0)
    t.set_require_sentence_end(True)
    t.set_silence_is_word(False)
    t.set_optional_short_silence(True)
    t.lex_read(str(tmp_path / "lex.dict"))
    t.set_sentence_boundary("<s>", "</s>")
    t.ngram_read(str(tmp_path / "lm.arpa"))
    if dense:
        from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch
        from aaltoasr_tpu.formats.lna import read_lna
        search = DenseBeamSearch(t.tree, t.lm, t.model, t.config)
        lp, _ = read_lna(lna)
        res = search.decode(lp)
    else:
        res = t.lna_decode(lna)
    return [w for w in res.words if w not in ("<s>", "</s>")]


class TestGoldenDecode:
    def test_clean_acoustics_identical(self, ref_driver, tmp_path):
        model, lex, wi = make_task(tmp_path, seed=0)
        for i, seq in enumerate([["aba"], ["ca", "bac"],
                                 ["ab", "cab", "ca"]]):
            lna = synth_lna(tmp_path, model, lex, seq, seed=10 + i,
                            noise=0.3, name=f"c{i}.lna")
            ref = run_reference(ref_driver, tmp_path, lna)
            ours = run_ours(tmp_path, lna)
            assert ours == ref == seq, (seq, ref, ours)

    def test_noisy_acoustics_mostly_identical(self, ref_driver,
                                              tmp_path):
        """Under real ambiguity both searches should pick the same
        1-best nearly always (identical model/scales/LM)."""
        model, lex, wi = make_task(tmp_path, seed=1)
        agree = 0
        n = 8
        for i in range(n):
            seq = [["aba"], ["ca"], ["bac", "ab"], ["cab"]][i % 4]
            lna = synth_lna(tmp_path, model, lex, seq, seed=100 + i,
                            noise=2.0, name=f"n{i}.lna")
            ref = run_reference(ref_driver, tmp_path, lna)
            ours = run_ours(tmp_path, lna)
            if ref == ours:
                agree += 1
        assert agree >= n - 1, f"only {agree}/{n} identical"

    def test_dense_matches_reference_clean(self, ref_driver, tmp_path):
        model, lex, wi = make_task(tmp_path, seed=2)
        lna = synth_lna(tmp_path, model, lex, ["bac", "ab"], seed=42,
                        noise=0.3, name="d.lna")
        ref = run_reference(ref_driver, tmp_path, lna)
        ours = run_ours(tmp_path, lna, dense=True)
        assert ours == ref


class TestGoldenDecodeDurations:
    def test_duration_model_identical(self, ref_driver, tmp_path):
        """Gamma duration models active on both sides (dur-scale 3,
        rectool.py:548)."""
        model, lex, wi = make_task(tmp_path, seed=3)
        rng = np.random.default_rng(7)
        S = model.num_states
        durs = np.zeros((S, 2))
        durs[:, 0] = rng.uniform(1.5, 3.0, S)       # shape a
        durs[:, 1] = rng.uniform(1.0, 2.0, S)       # scale b
        model_io.write_dur(str(tmp_path / "m.dur"), durs)

        import subprocess
        for i, seq in enumerate([["aba"], ["ca", "bac"]]):
            lna = synth_lna(tmp_path, model, lex, seq, seed=30 + i,
                            noise=1.2, frames_per_state=3,
                            name=f"g{i}.lna")
            out = subprocess.run(
                [ref_driver, "--ph", str(tmp_path / "m.ph"),
                 "--dur", str(tmp_path / "m.dur"),
                 "--lex", str(tmp_path / "lex.dict"),
                 "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
                 "--beam", "400", "--token-limit", "100000",
                 "--lm-scale", "10", "--dur-scale", "3",
                 "--trans-scale", "1", "--no-crossword"],
                check=True, capture_output=True, text=True, timeout=120)
            ref = [w for w in out.stdout.split()
                   if w not in ("<s>", "</s>", "*")]

            from aaltoasr_tpu.decoder.toolbox import Toolbox
            t = Toolbox(str(tmp_path / "m.ph"), str(tmp_path / "m.dur"))
            t.set_lm_scale(10.0)
            t.set_global_beam(400.0)
            t.set_duration_scale(3.0)
            t.set_transition_scale(1.0)
            t.set_require_sentence_end(True)
            t.set_silence_is_word(False)
            t.set_optional_short_silence(True)
            t.lex_read(str(tmp_path / "lex.dict"))
            t.set_sentence_boundary("<s>", "</s>")
            t.ngram_read(str(tmp_path / "lm.arpa"))
            res = t.lna_decode(lna)
            ours = [w for w in res.words if w not in ("<s>", "</s>")]
            assert ours == ref, (seq, ref, ours)
