"""Cross-word triphone + gamma-duration golden battery vs the built
reference C++ decoder — parity evidence at the HEADLINE bench operating
point (bench.py decodes a cross-word triphone tree with duration scale
3; rectool.py:547-548 defaults).

Scales tests/test_golden_crossword.py (3 phones, 5 words, 6 noisy
utterances) to a 4-phone/30-word task with the duration model active on
both sides, a batched decode on ours, and a >=90% 1-best agreement
assertion across a 12-utterance noisy battery (the reference:
TokenPassSearch over the TPLexPrefixTree fan-in/fan-out network,
`TPLexPrefixTree.hh:172-240`, with gamma durations
`decoder/src/Hmm.hh` StateDuration).
"""

import subprocess

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.arpa import ArpaLM, write_arpa
from aaltoasr_tpu.formats.lna import read_lna, write_lna

from tests.test_golden_decode import ref_driver  # fixture  # noqa: F401

PHONES = ["a", "b", "c", "d"]
CTX = PHONES + ["_"]


def make_battery(tmp_path, num_words=30, seed=11):
    rng = np.random.default_rng(seed)
    labels = [f"{x}-{y}+{z}" for y in PHONES for x in CTX for z in CTX]
    phone_list = [
        model_io.HmmPhone(lbl, [3 * i, 3 * i + 1, 3 * i + 2])
        for i, lbl in enumerate(labels)]
    S = 3 * len(labels)
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

    # gamma duration model, active on both sides (dur-scale 3)
    durs = np.zeros((S, 2))
    durs[:, 0] = rng.uniform(1.5, 3.0, S)
    durs[:, 1] = rng.uniform(1.0, 2.0, S)
    model_io.write_dur(str(tmp_path / "m.dur"), durs)

    # fixed-length prons: with cross-word triphones, boundary contexts
    # come from the ADJACENT word, so variable-length inventories
    # collide (pron "a" + "db" shares its full triphone state sequence
    # with pron "adb") and the 1-best is decided by LM noise alone.
    # Fixed-length codes are uniquely decodable, so acoustics pin the
    # segmentation and parity measures decoder behavior, not tie-
    # breaking.
    words = {}
    seen = set()
    # length-3 codes top out at 4^3 = 64; the 1k-word ambiguity sweep
    # uses length-5 (4^5 = 1024 uniquely decodable codes)
    pron_len = 3 if num_words <= 60 else 5
    if num_words > len(PHONES) ** pron_len - 8:
        raise ValueError(f"num_words {num_words} exceeds the "
                         f"length-{pron_len} code space")
    while len(words) < num_words:
        pron = tuple(PHONES[int(rng.integers(len(PHONES)))]
                     for _ in range(pron_len))
        if pron in seen:
            continue
        seen.add(pron)
        words[f"w{len(words)}"] = list(pron)

    # reference lexicon: triphone labels with '_' boundary contexts
    ref_lines = ["_ _", "__ __", "<s>(1.0)", "</s>(1.0)"]
    for w, ps in sorted(words.items()):
        toks = []
        for i, p in enumerate(ps):
            left = ps[i - 1] if i > 0 else "_"
            right = ps[i + 1] if i + 1 < len(ps) else "_"
            toks.append(f"{left}-{p}+{right}")
        ref_lines.append(f"{w} {' '.join(toks)}")
    (tmp_path / "ref_lex.dict").write_text("\n".join(ref_lines) + "\n")
    # ours: monophone pronunciations (the cross-word builder resolves
    # boundary contexts itself)
    our_lines = ["_ _", "__ __"] + [
        f"{w} {' '.join(ps)}" for w, ps in sorted(words.items())]
    (tmp_path / "our_lex.dict").write_text("\n".join(our_lines) + "\n")

    names = sorted(words)
    vocab = ["</s>", "<s>"] + names
    wi = {w: i for i, w in enumerate(vocab)}
    uni = {(wi[w],): (round(float(-1.0 - rng.random()), 4), -0.4)
           for w in vocab}
    uni[(wi["<s>"],)] = (-99.0, -0.4)
    bi = {}
    for a in ["<s>"] + names:
        for b in names + ["</s>"]:
            if rng.random() < 0.4:
                bi[(wi[a], wi[b])] = (
                    round(float(-0.2 - 1.2 * rng.random()), 4), 0.0)
    write_arpa(ArpaLM(order=2, vocab=vocab, word_index=wi,
                      ngrams=[{}, uni, bi]), str(tmp_path / "lm.arpa"))
    return model, words


def synth_lna(tmp_path, model, words, word_seq, seed, noise=1.0,
              fps=2, name="u.lna"):
    """LNA favoring the TRUE cross-word triphone state sequence
    (boundary contexts come from the ADJACENT words, not '_')."""
    rng = np.random.default_rng(seed)
    phone_of = {p.label: p for p in model.phones}
    mono = []
    for w in word_seq:
        mono.extend(words[w])
    seq_states = list(phone_of["__"].states) * 2
    for i, p in enumerate(mono):
        left = mono[i - 1] if i > 0 else "_"
        right = mono[i + 1] if i + 1 < len(mono) else "_"
        for s in phone_of[f"{left}-{p}+{right}"].states:
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


def run_ref(driver, tmp_path, lna, lm_scale=10.0, beam=220.0,
            oss=False):
    out = subprocess.run(
        [driver, "--ph", str(tmp_path / "m.ph"),
         "--dur", str(tmp_path / "m.dur"),
         "--lex", str(tmp_path / "ref_lex.dict"),
         "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
         "--beam", str(beam), "--token-limit", "60000",
         "--lm-scale", str(lm_scale), "--dur-scale", "3",
         "--trans-scale", "1", "--print-scores"]
        + ([] if oss else ["--no-oss"]),
        check=True, capture_output=True, text=True, timeout=300)
    total = None
    for line in out.stderr.splitlines():
        if line.startswith("scores total="):
            total = float(line.split()[1].split("=")[1])
    return ([w for w in out.stdout.split()
             if w not in ("<s>", "</s>", "*")], total)


class TestGoldenCrosswordBattery:
    def test_battery_agreement(self, ref_driver, tmp_path):
        model, words = make_battery(tmp_path)
        names = sorted(words)
        rng = np.random.default_rng(77)
        n_utt = 12
        lnas, refs, ref_totals = [], [], []
        for i in range(n_utt):
            seq = [names[int(rng.integers(len(names)))]
                   for _ in range(int(rng.integers(2, 5)))]
            lna = synth_lna(tmp_path, model, words, seq,
                            seed=700 + i, name=f"cb{i}.lna")
            r, tot = run_ref(ref_driver, tmp_path, lna)
            refs.append(r)
            ref_totals.append(tot)
            lnas.append(lna)

        from aaltoasr_tpu.decoder.toolbox import Toolbox
        t = Toolbox(str(tmp_path / "m.ph"), str(tmp_path / "m.dur"))
        t.set_lm_scale(10.0)
        t.set_global_beam(220.0)
        t.set_token_limit(4096)
        t.set_duration_scale(3.0)
        t.set_transition_scale(1.0)
        t.set_require_sentence_end(True)
        t.set_silence_is_word(False)
        t.lex_read(str(tmp_path / "our_lex.dict"))
        assert t.tree.root_pair_tgt.shape[0] > 1       # cross-word tree
        t.set_sentence_boundary("<s>", "</s>")
        t.ngram_read(str(tmp_path / "lm.arpa"))

        lps = [read_lna(p)[0] for p in lnas]
        T = max(lp.shape[0] for lp in lps)
        obs = np.stack([np.pad(lp, ((0, T - lp.shape[0]), (0, 0)))
                        for lp in lps])
        n = np.asarray([lp.shape[0] for lp in lps], np.int32)
        results = t.decode_batch(obs, n, lattice=False)

        agree = 0
        mismatches = []
        for i, res in enumerate(results):
            ours = [w for w in res.words if w not in ("<s>", "</s>")]
            if ours == refs[i]:
                agree += 1
                # token-total parity: both sides accumulate
                # LNA(natural) + trans_scale*log10(trans) +
                # dur_scale*ln(gamma) + lm_scale*log10(LM) — identical
                # arithmetic, so the winning totals must match up to
                # f32 accumulation order and the 2-byte LNA quantizer
                assert res.log_prob == pytest.approx(
                    ref_totals[i], abs=0.15), \
                    (i, res.log_prob, ref_totals[i])
            else:
                mismatches.append((i, refs[i], ours))
        assert agree >= int(0.9 * n_utt), \
            f"{agree}/{n_utt} identical; mismatches: {mismatches[:4]}"


    def test_optional_short_silence_parity(self, ref_driver, tmp_path):
        """Cross-word decode with the reference's DEFAULT optional
        short silence ON (TPLexPrefixTree.cc:822-832 weaves a looping
        1-state '_' between fan-out word ends and fan-in re-entry):
        1-best AND token totals must match."""
        model, words = make_battery(tmp_path)
        names = sorted(words)
        rng = np.random.default_rng(55)

        from aaltoasr_tpu.decoder.toolbox import Toolbox
        t = Toolbox(str(tmp_path / "m.ph"), str(tmp_path / "m.dur"))
        t.set_lm_scale(10.0)
        t.set_global_beam(220.0)
        t.set_token_limit(4096)
        t.set_duration_scale(3.0)
        t.set_transition_scale(1.0)
        t.set_require_sentence_end(True)
        t.set_silence_is_word(False)
        t.set_optional_short_silence(True)
        t.lex_read(str(tmp_path / "our_lex.dict"))
        t.set_sentence_boundary("<s>", "</s>")
        t.ngram_read(str(tmp_path / "lm.arpa"))

        agree = 0
        n_utt = 6
        for i in range(n_utt):
            seq = [names[int(rng.integers(len(names)))]
                   for _ in range(int(rng.integers(2, 5)))]
            lna = synth_lna(tmp_path, model, words, seq,
                            seed=1300 + i, name=f"oss{i}.lna")
            ref, ref_total = run_ref(ref_driver, tmp_path, lna,
                                     oss=True)
            res = t.lna_decode(lna, lattice=False)
            ours = [w for w in res.words if w not in ("<s>", "</s>")]
            if ours == ref:
                agree += 1
                assert res.log_prob == pytest.approx(ref_total,
                                                     abs=0.15)
        assert agree >= n_utt - 1, f"{agree}/{n_utt}"
