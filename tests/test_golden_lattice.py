"""Scaled golden battery vs the built reference C++ decoder: a ~1000
word lexicon, dozens of noisy LNAs, LM lookahead enabled on BOTH
engines, plus word-graph (SLF) parity.

Checks, per VERDICT round-2 item 3:
  (a) 1-best agreement >= 95% across the battery with lookahead on
      (reference: Toolbox::read_lookahead_ngram `Toolbox.hh:74`,
      TokenPassSearch::get_lm_lookahead_score; ours
      `search.py` unigram_lookahead),
  (b) our SLF word graphs contain the reference's 1-best path and the
      reference's word graphs (TokenPassSearch.cc:2443-2533
      write_word_graph) contain ours, with our lattice's own best path
      matching our 1-best decode.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.arpa import ArpaLM, write_arpa
from aaltoasr_tpu.formats.lna import read_lna

sys.path.insert(0, os.path.dirname(__file__))

from test_golden_decode import ref_driver, synth_lna  # noqa: E402,F401


def make_battery_task(tmp_path, num_words=1000, seed=21):
    rng = np.random.default_rng(seed)
    phones = [chr(ord("a") + i) for i in range(14)]
    S = 3 * len(phones) + 4
    D = 1
    phone_list = [model_io.HmmPhone(p, [3 * i, 3 * i + 1, 3 * i + 2])
                  for i, p in enumerate(phones)]
    base = 3 * len(phones)
    phone_list.append(model_io.HmmPhone("_", [base]))
    phone_list.append(
        model_io.HmmPhone("__", [base + 1, base + 2, base + 3]))
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
        n = int(rng.integers(3, 8))
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
    uni = {(wi[w],): (round(float(-1.0 - 2.0 * rng.random()), 4), -0.4)
           for w in vocab}
    uni[(wi["<s>"],)] = (-99.0, -0.4)
    bi = {}
    for w in words:
        # each word gets a handful of likely successors
        for _ in range(6):
            nxt = words[int(rng.integers(len(words)))]
            bi[(wi[w], wi[nxt])] = (
                round(float(-0.2 - 1.2 * rng.random()), 4), 0.0)
        bi[(wi[w], wi["</s>"])] = (-0.7, 0.0)
    for _ in range(400):
        nxt = words[int(rng.integers(len(words)))]
        bi[(wi["<s>"], wi[nxt])] = (
            round(float(-0.2 - 1.2 * rng.random()), 4), 0.0)
    lm = ArpaLM(order=2, vocab=vocab, word_index=wi,
                ngrams=[{}, uni, bi])
    write_arpa(lm, str(tmp_path / "lm.arpa"))
    return model, lex, wi


def ref_decode_wg(driver, tmp_path, lna, wg_path, lm_scale=10.0,
                  beam=140.0, token_limit=30000):
    out = subprocess.run(
        [driver, "--ph", str(tmp_path / "m.ph"),
         "--lex", str(tmp_path / "lex.dict"),
         "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
         "--beam", str(beam), "--token-limit", str(token_limit),
         "--lm-scale", str(lm_scale), "--dur-scale", "0",
         "--trans-scale", "1", "--no-crossword",
         "--lookahead", str(tmp_path / "lm.arpa"),
         "--wordgraph", wg_path],
        check=True, capture_output=True, text=True, timeout=600)
    words = [w for w in out.stdout.split()
             if w not in ("<s>", "</s>", "*")]
    return words


def slf_paths_contain(slf_path, words):
    """True iff the word sequence is a start->end path of the SLF
    lattice (!NULL arcs are epsilon)."""
    from aaltoasr_tpu.decoder.slf import SlfLattice
    lat = SlfLattice.read(slf_path)
    out = {}
    for a in lat.arcs:
        out.setdefault(a["S"], []).append(a)
    # epsilon-closure BFS over (node, matched-prefix-length)
    states = {(lat.start, 0)}
    frontier = list(states)
    while frontier:
        node, k = frontier.pop()
        for a in out.get(node, ()):  # noqa: B905
            if a["W"] == "!NULL":
                nxt = (a["E"], k)
            elif k < len(words) and a["W"] == words[k]:
                nxt = (a["E"], k + 1)
            else:
                continue
            if nxt not in states:
                states.add(nxt)
                frontier.append(nxt)
    return (lat.end, len(words)) in states


class TestGoldenLatticeBattery:
    def test_battery_agreement_and_lattices(self, ref_driver, tmp_path):
        model, lex, wi = make_battery_task(tmp_path)
        words = sorted(lex)
        rng = np.random.default_rng(33)
        n_utt = 50
        lnas, refs, seqs = [], [], []
        for i in range(n_utt):
            seq = [words[int(rng.integers(len(words)))]
                   for _ in range(int(rng.integers(3, 7)))]
            lna = synth_lna(tmp_path, model, lex, seq, seed=100 + i,
                            noise=0.35, frames_per_state=2,
                            name=f"b{i}.lna")
            wg = str(tmp_path / f"ref{i}.slf")
            ref = ref_decode_wg(ref_driver, tmp_path, lna, wg)
            lnas.append(lna)
            refs.append(ref)
            seqs.append(seq)

        # ours: one batched lattice decode with lookahead enabled
        from aaltoasr_tpu.decoder.toolbox import Toolbox
        t = Toolbox(str(tmp_path / "m.ph"))
        t.set_lm_scale(10.0)
        t.set_global_beam(140.0)
        t.set_token_limit(2048)
        t.set_duration_scale(0.0)
        t.set_transition_scale(1.0)
        t.set_require_sentence_end(True)
        t.set_silence_is_word(False)
        t.set_optional_short_silence(True)
        t.set_lm_lookahead(1)
        t.lex_read(str(tmp_path / "lex.dict"))
        t.set_sentence_boundary("<s>", "</s>")
        t.ngram_read(str(tmp_path / "lm.arpa"))

        lps = [read_lna(l)[0] for l in lnas]
        T = max(lp.shape[0] for lp in lps)
        obs = np.stack([np.pad(lp, ((0, T - lp.shape[0]), (0, 0)))
                        for lp in lps])
        n = np.asarray([lp.shape[0] for lp in lps], np.int32)
        results = t.decode_batch(obs, n, lattice=True)

        agree = 0
        checked_lat = 0
        for i, res in enumerate(results):
            ours = [w for w in res.words if w not in ("<s>", "</s>")]
            if ours == refs[i]:
                agree += 1
            # (b) lattice cross-containment on a sample (SLF IO is
            # host-side; 12 utterances keep the test fast)
            if i % 4 == 0:
                g = res.word_graph()
                our_slf = str(tmp_path / f"our{i}.slf")
                g.write_slf(our_slf)
                assert slf_paths_contain(our_slf, ours), \
                    f"utt {i}: our lattice misses our own 1-best"
                assert slf_paths_contain(our_slf, refs[i]), \
                    f"utt {i}: our lattice misses reference 1-best " \
                    f"{refs[i]} (ours {ours})"
                assert slf_paths_contain(str(tmp_path / f"ref{i}.slf"),
                                         ours), \
                    f"utt {i}: reference lattice misses our 1-best " \
                    f"{ours} (ref {refs[i]})"
                # our n-best contains our 1-best at rank 1
                nb = g.nbest(5)
                top = [w for w in nb[0][0]
                       if w not in ("<s>", "</s>", "!NULL")]
                assert top == ours, (top, ours)
                checked_lat += 1

        frac = agree / n_utt
        print(f"\nbattery: {agree}/{n_utt} utterances identical "
              f"({100 * frac:.0f}%), {checked_lat} lattices "
              f"cross-checked", file=sys.stderr)
        assert frac >= 0.95, f"1-best agreement {agree}/{n_utt}"

    def test_nbest_scores_and_oracle_parity(self, ref_driver, tmp_path):
        """N-best LIST + score parity and oracle-WER between the two
        implementations' lattices (round-3 VERDICT #5): both SLFs are
        run through the same exact A* extractor; rank-1 must equal each
        engine's 1-best, the top-5 sets must overlap, common sequences
        must score identically (same quantized LNA, same scales), and
        the oracle error of each lattice vs the planted sequence
        quantifies record-capacity truncation
        (`TokenPassSearch.cc:2443-2533` write_word_graph;
        num_records/records_half on our side)."""
        from aaltoasr_tpu.decoder.slf import SlfLattice
        from aaltoasr_tpu.decoder.toolbox import Toolbox

        model, lex, wi = make_battery_task(tmp_path)
        words = sorted(lex)
        rng = np.random.default_rng(77)
        n_utt = 12

        t = Toolbox(str(tmp_path / "m.ph"))
        t.set_lm_scale(10.0)
        t.set_global_beam(140.0)
        t.set_token_limit(2048)
        t.set_duration_scale(0.0)
        t.set_transition_scale(1.0)
        t.set_require_sentence_end(True)
        t.set_silence_is_word(False)
        t.set_optional_short_silence(True)
        t.set_lm_lookahead(1)
        t.lex_read(str(tmp_path / "lex.dict"))
        t.set_sentence_boundary("<s>", "</s>")
        t.ngram_read(str(tmp_path / "lm.arpa"))

        def strip(seq):
            return [w for w in seq
                    if w not in ("<s>", "</s>", "!NULL", "_", "__")]

        overlaps, score_deltas = [], []
        oracle_ref, oracle_our = [], []
        for i in range(n_utt):
            seq = [words[int(rng.integers(len(words)))]
                   for _ in range(int(rng.integers(3, 7)))]
            lna = synth_lna(tmp_path, model, lex, seq, seed=700 + i,
                            noise=0.35, frames_per_state=2,
                            name=f"nb{i}.lna")
            ref_slf = str(tmp_path / f"refnb{i}.slf")
            ref_words = ref_decode_wg(ref_driver, tmp_path, lna, ref_slf)

            res = t.lna_decode(lna, lattice=True)
            ours = strip(res.words)
            our_slf = str(tmp_path / f"ournb{i}.slf")
            res.word_graph().write_slf(our_slf)

            ref_lat = SlfLattice.read(ref_slf)
            our_lat = SlfLattice.read(our_slf)
            ref_nb = [(tuple(strip(w)), s) for w, s in ref_lat.nbest(5)]
            our_nb = [(tuple(strip(w)), s) for w, s in our_lat.nbest(5)]

            # rank-1 of each lattice == that engine's 1-best decode
            assert list(ref_nb[0][0]) == ref_words, i
            assert list(our_nb[0][0]) == ours, i

            # rank-1 scores are exact (the winner path's arc scores are
            # its own token partials on both sides)
            assert abs(ref_nb[0][1] - our_nb[0][1]) <= 0.01, i
            ref_set = {w for w, _ in ref_nb}
            our_set = {w for w, _ in our_nb}
            common = ref_set & our_set
            overlaps.append(len(common))
            # deeper common sequences: both lattices carry word-pair-
            # approximated arc scores (use_word_pair_approximation /
            # our (frame, word) node merge), so totals may differ by
            # the approximation, bounded below
            rs = dict(ref_nb)
            os_ = dict(our_nb)
            for wseq in common:
                score_deltas.append(abs(rs[wseq] - os_[wseq]))
            oracle_ref.append(ref_lat.oracle_error(seq))
            oracle_our.append(our_lat.oracle_error(seq))

        print(f"\nnbest battery: top-5 overlap {overlaps}, "
              f"max common-score delta "
              f"{max(score_deltas) if score_deltas else 0:.4f}, "
              f"oracle errors ref={oracle_ref} our={oracle_our}",
              file=sys.stderr)
        # strong typical overlap (an occasional utterance may diverge
        # under the battery's planted noise, like the 1-best battery's
        # own 95% bar), never empty
        assert min(overlaps) >= 1, overlaps
        assert sum(overlaps) >= 3 * n_utt, overlaps
        # common paths score within the word-pair approximation error
        assert max(score_deltas) <= 1.0, max(score_deltas)
        # oracle: our record-bounded lattices reach the planted truth
        # at least as well as the reference's (no hidden truncation)
        assert sum(oracle_our) <= sum(oracle_ref) + 1, \
            (oracle_our, oracle_ref)
