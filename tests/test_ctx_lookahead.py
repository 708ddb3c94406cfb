"""Context (>= trigram) LM lookahead: table construction against brute
force, and golden 1-best parity vs the reference decoder running its
trigram lookahead (`TokenPassSearch.cc:2084` get_lm_trigram_lookahead,
`TreeGram.cc:549` fetch_trigram_list; driver --la-mode 2).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from aaltoasr_tpu.formats.arpa import ArpaLM, write_arpa

sys.path.insert(0, os.path.dirname(__file__))

from test_golden_decode import (  # noqa: E402,F401
    make_task, ref_driver, synth_lna)

from aaltoasr_tpu.decoder.lexicon import (  # noqa: E402
    build_prefix_tree, read_lexicon)
from aaltoasr_tpu.decoder.ngram import NGramFsa  # noqa: E402
from aaltoasr_tpu.decoder.search import (  # noqa: E402
    LOG_ZERO, context_lookahead_tables, tree_dfs_intervals)


def make_trigram_task(tmp_path, seed=7):
    """Monophone model + lexicon + TRIGRAM ARPA."""
    model, lex, wi2 = make_task(tmp_path, seed=seed)
    words = sorted(lex)
    rng = np.random.default_rng(seed + 1)
    vocab = ["</s>", "<s>"] + words
    wi = {w: i for i, w in enumerate(vocab)}
    uni = {(wi[w],): (-1.2, -0.5) for w in vocab}
    uni[(wi["<s>"],)] = (-99.0, -0.5)
    bi, tri = {}, {}
    for a in ["<s>"] + words:
        for b in words + ["</s>"]:
            if rng.random() < 0.6:
                bi[(wi[a], wi[b])] = (
                    round(float(-0.3 - rng.random()), 4), -0.3)
    for (a, b) in list(bi):
        for c in [wi[w] for w in words] + [wi["</s>"]]:
            if rng.random() < 0.3:
                tri[(a, b, c)] = (
                    round(float(-0.1 - 0.8 * rng.random()), 4), 0.0)
    lm = ArpaLM(order=3, vocab=vocab, word_index=wi,
                ngrams=[{}, uni, bi, tri])
    write_arpa(lm, str(tmp_path / "lm.arpa"))
    return model, lex, wi


class TestIntervalsAndTables:
    def test_intervals_cover_word_ends(self, tmp_path):
        model, lex, wi = make_trigram_task(tmp_path)
        entries = read_lexicon(str(tmp_path / "lex.dict"))
        tree = build_prefix_tree(model, entries, silence_is_word=False,
                                 optional_short_silence=True)
        iv = tree_dfs_intervals(tree)
        assert iv is not None
        lo, hi = iv
        # every live arc nests; root intervals cover their subtrees
        assert (hi >= lo).all()

    def test_la_value_matches_bruteforce(self, tmp_path):
        model, lex, wi = make_trigram_task(tmp_path)
        entries = read_lexicon(str(tmp_path / "lex.dict"))
        tree = build_prefix_tree(model, entries, silence_is_word=False,
                                 optional_short_silence=True)
        from aaltoasr_tpu.formats.arpa import read_arpa
        fsa = NGramFsa.from_arpa(read_arpa(str(tmp_path / "lm.arpa")))
        la_ids = [fsa.word_index.get(w, -1) for w in tree.vocab]
        ctx = context_lookahead_tables(tree, fsa, la_ids)
        assert ctx is not None
        lo, hi = ctx["la_lo"], ctx["la_hi"]
        # brute force per (state, node): subtree words via intervals,
        # la via explicit-successor max per backoff level
        we_w = np.asarray(tree.we_word)
        valid = np.asarray(tree.we_exit_logp) > LOG_ZERO / 2
        ends = {}
        for n, h in zip(*np.nonzero(valid)):
            w = int(we_w[n, h])
            if w >= 0:
                ends.setdefault(w, []).append(int(lo[n]))
        rng = np.random.default_rng(0)
        states = rng.integers(0, fsa.num_states, 12)
        nodes = rng.integers(0, tree.num_nodes, 12)
        for s0, n in zip(states, nodes):
            sub = {w for w, ps in ends.items()
                   if any(lo[n] <= p < hi[n] for p in ps)}
            # table-driven value
            best = -np.inf
            acc, cur = 0.0, int(s0)
            for _ in range(fsa.order - 1):
                row = ctx["la_pos"][cur]
                msk = (row >= lo[n]) & (row < hi[n])
                if msk.any():
                    best = max(best,
                               acc + float(ctx["la_sc"][cur][msk].max()))
                acc += float(ctx["la_bo"][cur])
                cur = int(ctx["la_bnext"][cur])
            # brute expected: same levels computed from the FSA CSR
            exp = -np.inf
            acc2, cur2 = 0.0, int(s0)
            for _ in range(fsa.order - 1):
                sf = fsa.state_first
                if cur2 != 0:
                    for i in range(int(sf[cur2]), int(sf[cur2 + 1])):
                        wlm = int(fsa.trans_word[i])
                        tws = [w for w in sub if la_ids[w] == wlm]
                        if tws:
                            exp = max(exp,
                                      acc2 + float(fsa.trans_prob[i]))
                acc2 += (float(fsa.bo_weight[cur2]) if cur2 != 0
                         else 0.0)
                cur2 = int(fsa.bo_next[cur2])
            assert np.isclose(best, exp) or (
                best == -np.inf and exp == -np.inf), (s0, n, best, exp)


def run_reference_la(driver, tmp_path, lna, la_mode, lm_scale=10.0,
                     beam=120.0, token_limit=4000):
    out = subprocess.run(
        [driver, "--ph", str(tmp_path / "m.ph"),
         "--lex", str(tmp_path / "lex.dict"),
         "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
         "--beam", str(beam), "--token-limit", str(token_limit),
         "--lm-scale", str(lm_scale), "--dur-scale", "0",
         "--trans-scale", "1", "--no-crossword",
         "--lookahead", str(tmp_path / "lm.arpa"),
         "--la-mode", str(la_mode)],
        check=True, capture_output=True, text=True, timeout=300)
    return [w for w in out.stdout.split()
            if w not in ("<s>", "</s>", "*")]


def run_ours_la(tmp_path, lna, mode, lm_scale=10.0, beam=120.0):
    from aaltoasr_tpu.decoder.toolbox import Toolbox
    t = Toolbox(str(tmp_path / "m.ph"))
    t.set_lm_scale(lm_scale)
    t.set_global_beam(beam)
    t.set_duration_scale(0.0)
    t.set_require_sentence_end(True)
    t.set_silence_is_word(False)
    t.set_optional_short_silence(True)
    t.set_lm_lookahead(mode)
    t.lex_read(str(tmp_path / "lex.dict"))
    t.set_sentence_boundary("<s>", "</s>")
    t.ngram_read(str(tmp_path / "lm.arpa"))
    res = t.lna_decode(lna)
    # the context mode must actually engage (no silent fallback)
    if mode >= 3:
        assert t._search._la_ctx
    return [w for w in res.words if w not in ("<s>", "</s>")]


class TestGoldenTrigramLookahead:
    def test_1best_matches_reference_trigram_la(self, ref_driver,
                                                tmp_path):
        model, lex, wi = make_trigram_task(tmp_path)
        words = sorted(lex)
        rng = np.random.default_rng(17)
        for i in range(5):
            seq = [words[int(rng.integers(len(words)))]
                   for _ in range(int(rng.integers(2, 5)))]
            lna = synth_lna(tmp_path, model, lex, seq, seed=60 + i,
                            noise=0.35, name=f"t{i}.lna")
            ref = run_reference_la(ref_driver, tmp_path, lna,
                                   la_mode=2)
            ours = run_ours_la(tmp_path, lna, mode=3)
            assert ours == ref, (i, seq, ref, ours)
