"""Morph-mode golden parity vs the reference decoder: word-boundary
`<w>` committed by the short-silence nodes, sentence-end LM restarts,
double-boundary pruning (the reference's morph LVCSR operating point,
rectool.py:529-530,563-564: silence_is_word=1 + set_word_boundary).

The reference commits a word when ENTERING its last node; ours when
EXITING it — identical mid-utterance (same arcs, same scores), but at
the utterance end the reference's trailing long-silence cycles commit
one extra `</s> <s> <w>` group that ours leaves uncommitted.  rectool's
own post-processing (rectool.py:1025-1037) collapses those boundary
tokens, so parity is asserted on the morph sequence and on the
rectool-normalized text.
"""

import subprocess

import numpy as np

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.arpa import ArpaLM, write_arpa
from aaltoasr_tpu.formats.lna import read_lna, write_lna

from tests.test_golden_decode import ref_driver  # fixture  # noqa: F401

PH = ["a", "b", "c"]
CTX = PH + ["_"]
MORPHS = {"ma": ["a"], "mab": ["a", "b"], "mb": ["b"],
          "mbc": ["b", "c"], "mc": ["c"], "mca": ["c", "a"]}


def make_task(tmp, durations=False):
    labels = [f"{x}-{y}+{z}" for y in PH for x in CTX for z in CTX]
    plist = [model_io.HmmPhone(lbl, [3 * i, 3 * i + 1, 3 * i + 2])
             for i, lbl in enumerate(labels)]
    S = 3 * len(labels)
    plist.append(model_io.HmmPhone("_", [S]))
    plist.append(model_io.HmmPhone("__", [S + 1, S + 2, S + 3]))
    S += 4
    model = model_io.HmmModel(
        dim=1, cov_type="diagonal_cov",
        means=np.zeros((S, 1)), covars=np.ones((S, 1)),
        mixtures=[(np.array([i], np.int32), np.array([1.0]))
                  for i in range(S)],
        phones=plist,
        transitions={i: [(0, 0.5), (1, 0.5)] for i in range(S)})
    model_io.write_ph(str(tmp / "m.ph"), model)
    if durations:
        rngd = np.random.default_rng(8)
        durs = np.stack([rngd.uniform(1.5, 3.0, S),
                         rngd.uniform(1.0, 2.0, S)], axis=1)
        model_io.write_dur(str(tmp / "m.dur"), durs)

    # reference: triphone labels; silences FIRST (the reference wires
    # fan-out silences during add_word, so the 1-state '_' entry must
    # precede the morphs, TPLexPrefixTree.cc:1122-1127)
    ref = ["<w> _", "</s>(1.0) __", "<s>(1.0)"]
    for w, ps in MORPHS.items():
        toks = []
        for i, p2 in enumerate(ps):
            left = ps[i - 1] if i else "_"
            right = ps[i + 1] if i + 1 < len(ps) else "_"
            toks.append(f"{left}-{p2}+{right}")
        ref.append(f"{w} " + " ".join(toks))
    (tmp / "ref_lex.dict").write_text("\n".join(ref) + "\n")
    ours = [f"{w} " + " ".join(ps) for w, ps in MORPHS.items()]
    ours += ["<w> _", "</s>(1.0) __", "<s>(1.0)"]
    (tmp / "our_lex.dict").write_text("\n".join(ours) + "\n")

    vocab = ["</s>", "<s>", "<w>"] + sorted(MORPHS)
    wi = {w: i for i, w in enumerate(vocab)}
    rng = np.random.default_rng(5)
    uni = {(wi[w],): (round(float(-0.8 - rng.random()), 4), -0.35)
           for w in vocab}
    uni[(wi["<s>"],)] = (-99.0, -0.35)
    bi = {}
    for a in vocab[2:]:
        for b2 in vocab[2:]:
            if rng.random() < 0.5:
                bi[(wi[a], wi[b2])] = (
                    round(float(-0.2 - 0.8 * rng.random()), 4), 0.0)
    bi[(wi["<s>"], wi["<w>"])] = (-0.1, 0.0)
    bi[(wi["<w>"], wi["</s>"])] = (-0.4, 0.0)
    write_arpa(ArpaLM(order=2, vocab=vocab, word_index=wi,
                      ngrams=[{}, uni, bi]), str(tmp / "lm.arpa"))
    return model


def synth(tmp, model, seq, with_ss, seed, name):
    rng = np.random.default_rng(seed)
    phone_of = {p.label: p for p in model.phones}
    mono = []
    for i, m in enumerate(seq):
        mono.extend([(p, False) for p in MORPHS[m]])
        if with_ss and i + 1 < len(seq) and i % 2 == 0:
            mono.append(("_", True))
    states = list(phone_of["__"].states) * 2
    for i, (p, is_sil) in enumerate(mono):
        if is_sil:
            states.extend([phone_of["_"].states[0]] * 2)
            continue
        left = mono[i - 1][0] if i else "_"
        right = mono[i + 1][0] if i + 1 < len(mono) else "_"
        for s in phone_of[f"{left}-{p}+{right}"].states:
            states.extend([s] * 2)
    states += list(phone_of["__"].states) * 2
    T = len(states)
    S = model.num_states
    lp = np.full((T, S), -8.0, np.float32)
    lp[np.arange(T), states] = -0.35
    lp += 0.5 * rng.standard_normal((T, S)).astype(np.float32)
    lp -= np.log(np.exp(lp).sum(axis=1, keepdims=True))
    write_lna(str(tmp / name), lp, lna_bytes=2)
    return str(tmp / name)


def morph_seq(words):
    """Strip boundary/sentence tokens -> the morph sequence."""
    return [w for w in words if w not in ("<s>", "</s>", "<w>", "*")]


def rectool_text(words):
    """rectool.py:1025-1037 morph post-processing."""
    s = "".join(words)
    s = s.replace("<w></s><s><w>", " ").replace("<w>", " ")
    s = s.replace("<s>", "").replace("</s>", "")
    return " ".join(s.split())


class TestGoldenMorph:
    def test_morph_decode_parity(self, ref_driver, tmp_path):
        model = make_task(tmp_path)
        names = sorted(MORPHS)
        rng = np.random.default_rng(9)

        from aaltoasr_tpu.decoder.toolbox import Toolbox
        t = Toolbox(str(tmp_path / "m.ph"))
        t.set_lm_scale(10.0)
        t.set_global_beam(250.0)
        t.set_token_limit(4096)
        t.set_duration_scale(0.0)
        t.set_transition_scale(1.0)
        t.set_require_sentence_end(True)
        t.set_silence_is_word(True)
        t.set_optional_short_silence(True)
        t.set_word_boundary("<w>")
        t.lex_read(str(tmp_path / "our_lex.dict"))
        t.set_sentence_boundary("<s>", "</s>")
        t.ngram_read(str(tmp_path / "lm.arpa"))

        from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch
        dense = DenseBeamSearch(t.tree, t.lm, t.model, t.config)

        n_utt = 8
        seq_agree = txt_agree = dense_agree = 0
        for i in range(n_utt):
            seq = [names[int(rng.integers(len(names)))]
                   for _ in range(int(rng.integers(2, 5)))]
            lna = synth(tmp_path, model, seq, with_ss=(i % 2 == 0),
                        seed=400 + i, name=f"m{i}.lna")
            out = subprocess.run(
                [ref_driver, "--ph", str(tmp_path / "m.ph"),
                 "--lex", str(tmp_path / "ref_lex.dict"),
                 "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
                 "--beam", "250", "--token-limit", "60000",
                 "--lm-scale", "10", "--dur-scale", "0",
                 "--trans-scale", "1", "--word-boundary", "<w>",
                 "--silence-is-word"],
                check=True, capture_output=True, text=True, timeout=300)
            ref_raw = out.stdout.split()
            res = t.lna_decode(lna, lattice=False)
            ours_raw = ["<s>"] + res.words + ["</s>"]
            seq_agree += (morph_seq(ours_raw) == morph_seq(ref_raw))
            txt_agree += (rectool_text(ours_raw)
                          == rectool_text(ref_raw))
            lp, _ = read_lna(lna)
            dres = dense.decode(lp, lattice=False)
            dense_agree += (morph_seq(dres.words)
                            == morph_seq(ours_raw))
        assert seq_agree >= n_utt - 1, f"morph seq {seq_agree}/{n_utt}"
        assert txt_agree >= n_utt - 1, f"text {txt_agree}/{n_utt}"
        assert dense_agree >= n_utt - 1, \
            f"dense vs exact {dense_agree}/{n_utt}"


class TestFinalFrameCommit:
    def test_word_without_trailing_silence(self, ref_driver, tmp_path):
        """The reference commits a word on ENTERING its last node, so
        an utterance that ends exactly on the word still prints it;
        our exit-based engines recover it through the
        committed-at-final alternative (search.py _final_commit).
        Totals are not compared: the reference's get_best_final_token
        prefers NODE_FINAL (silence) tokens, so its winner jumps into
        silence at the last frame and pays that observation."""
        import subprocess

        from tests.test_golden_decode import make_task
        from aaltoasr_tpu.formats.lna import write_lna
        model, lex, wi = make_task(tmp_path)
        phone_of = {p.label: p for p in model.phones}
        states = [s for s in phone_of["__"].states for _ in range(2)]
        for ph in lex["aba"]:
            states += [s for s in phone_of[ph].states
                       for _ in range(3)]
        rng = np.random.default_rng(4)
        T, S = len(states), model.num_states
        lp = np.full((T, S), -8.0, np.float32)
        lp[np.arange(T), states] = -0.4
        lp += 0.3 * rng.standard_normal((T, S)).astype(np.float32)
        lp -= np.log(np.exp(lp).sum(axis=1, keepdims=True))
        write_lna(str(tmp_path / "u.lna"), lp, lna_bytes=2)
        out = subprocess.run(
            [ref_driver, "--ph", str(tmp_path / "m.ph"),
             "--lex", str(tmp_path / "lex.dict"),
             "--arpa", str(tmp_path / "lm.arpa"),
             "--lna", str(tmp_path / "u.lna"),
             "--beam", "300", "--token-limit", "20000",
             "--lm-scale", "10", "--dur-scale", "0",
             "--trans-scale", "1", "--no-crossword"],
            check=True, capture_output=True, text=True, timeout=120)
        ref = [w for w in out.stdout.split()
               if w not in ("<s>", "</s>", "*")]
        assert ref == ["aba"]

        from aaltoasr_tpu.decoder.toolbox import Toolbox
        t = Toolbox(str(tmp_path / "m.ph"))
        t.set_lm_scale(10.0)
        t.set_global_beam(300.0)
        t.set_token_limit(2048)
        t.set_duration_scale(0.0)
        t.set_transition_scale(1.0)
        t.set_require_sentence_end(True)
        t.set_silence_is_word(False)
        t.set_optional_short_silence(True)
        t.lex_read(str(tmp_path / "lex.dict"))
        t.set_sentence_boundary("<s>", "</s>")
        t.ngram_read(str(tmp_path / "lm.arpa"))
        for lat in (True, False):
            res = t.lna_decode(str(tmp_path / "u.lna"), lattice=lat)
            got = [w for w in res.words
                   if w not in ("<s>", "</s>")]
            assert got == ["aba"], (lat, got)


    def test_morph_with_durations(self, ref_driver, tmp_path):
        """Morph mode with the gamma duration model active on both
        sides (dur-scale 3) — the full Finnish-recipe operating
        point."""
        model = make_task(tmp_path, durations=True)
        names = sorted(MORPHS)
        rng = np.random.default_rng(21)

        from aaltoasr_tpu.decoder.toolbox import Toolbox
        t = Toolbox(str(tmp_path / "m.ph"), str(tmp_path / "m.dur"))
        t.set_lm_scale(10.0)
        t.set_global_beam(250.0)
        t.set_token_limit(4096)
        t.set_duration_scale(3.0)
        t.set_transition_scale(1.0)
        t.set_require_sentence_end(True)
        t.set_silence_is_word(True)
        t.set_optional_short_silence(True)
        t.set_word_boundary("<w>")
        t.lex_read(str(tmp_path / "our_lex.dict"))
        t.set_sentence_boundary("<s>", "</s>")
        t.ngram_read(str(tmp_path / "lm.arpa"))

        n_utt = 5
        agree = 0
        for i in range(n_utt):
            seq = [names[int(rng.integers(len(names)))]
                   for _ in range(int(rng.integers(2, 4)))]
            lna = synth(tmp_path, model, seq, with_ss=(i % 2 == 0),
                        seed=800 + i, name=f"d{i}.lna")
            out = subprocess.run(
                [ref_driver, "--ph", str(tmp_path / "m.ph"),
                 "--dur", str(tmp_path / "m.dur"),
                 "--lex", str(tmp_path / "ref_lex.dict"),
                 "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
                 "--beam", "250", "--token-limit", "60000",
                 "--lm-scale", "10", "--dur-scale", "3",
                 "--trans-scale", "1", "--word-boundary", "<w>",
                 "--silence-is-word"],
                check=True, capture_output=True, text=True,
                timeout=300)
            res = t.lna_decode(lna, lattice=False)
            agree += (morph_seq(["<s>"] + res.words + ["</s>"])
                      == morph_seq(out.stdout.split()))
        assert agree >= n_utt - 1, f"{agree}/{n_utt}"
