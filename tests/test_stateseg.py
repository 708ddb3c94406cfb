"""State-segmentation parity vs the built reference decoder.

The reference threads StateHistory entries through the token search
(`TokenPassSearch.cc:668-680` print_state_history -> ``start end state``
lines, `Toolbox.hh:334`); ours re-aligns the decoded word sequence with
the hmmnet Viterbi (decoder/stateseg.py).  With duration scale 0 both
produce the acoustically optimal state path of the winning hypothesis,
so the segment lists must agree.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_golden_decode import (  # noqa: E402
    make_task, ref_driver, synth_lna)  # noqa: F401

from aaltoasr_tpu.formats.lna import read_lna  # noqa: E402


def run_reference_stateseg(driver, tmp_path, lna, lm_scale=10.0,
                           beam=400.0):
    seg_path = str(tmp_path / "ref.stateseg")
    out = subprocess.run(
        [driver, "--ph", str(tmp_path / "m.ph"),
         "--lex", str(tmp_path / "lex.dict"),
         "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
         "--beam", str(beam), "--token-limit", "100000",
         "--lm-scale", str(lm_scale), "--dur-scale", "0",
         "--trans-scale", "1", "--no-crossword",
         "--stateseg", seg_path],
        check=True, capture_output=True, text=True, timeout=300)
    words = [w for w in out.stdout.split()
             if w not in ("<s>", "</s>", "*")]
    segs = []
    for line in open(seg_path):
        a, b, s = (int(x) for x in line.split())
        segs.append((a, b, s))
    return words, segs


def run_ours_stateseg(tmp_path, lna, lm_scale=10.0, beam=400.0):
    from aaltoasr_tpu.decoder.toolbox import Toolbox
    t = Toolbox(str(tmp_path / "m.ph"))
    t.set_lm_scale(lm_scale)
    t.set_global_beam(beam)
    t.set_duration_scale(0.0)
    t.set_require_sentence_end(True)
    t.set_silence_is_word(False)
    t.set_optional_short_silence(True)
    t.lex_read(str(tmp_path / "lex.dict"))
    t.set_sentence_boundary("<s>", "</s>")
    t.ngram_read(str(tmp_path / "lm.arpa"))
    res = t.lna_decode(lna)
    lp, _ = read_lna(lna)
    segs = t.state_segmentation(res, lp)
    words = [w for w in res.words if w not in ("<s>", "</s>")]
    return words, [(s.start, s.end, s.state) for s in segs]


def canon(segs):
    """Merge adjacent same-state runs and drop zero-length entries:
    the reference emits one StateHistory entry per node move (a skip
    within one phone repeats the state), ours one per state occupancy."""
    out = []
    for (a, b, s) in segs:
        if b <= a:
            continue
        if out and out[-1][2] == s and out[-1][1] == a:
            out[-1] = (out[-1][0], b, s)
        else:
            out.append((a, b, s))
    return out


class TestStateSegParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_stateseg_matches_reference(self, tmp_path, ref_driver,
                                        seed):
        model, lex, wi = make_task(tmp_path, seed=seed)
        rng = np.random.default_rng(seed + 100)
        words = [list(lex)[i] for i in
                 rng.integers(0, len(lex), 3)]
        lna = synth_lna(tmp_path, model, lex, words, seed + 7,
                        noise=0.8)
        ref_words, ref_segs = run_reference_stateseg(
            ref_driver, tmp_path, lna)
        our_words, our_segs = run_ours_stateseg(tmp_path, lna)
        assert our_words == ref_words
        assert canon(ref_segs) == canon(our_segs)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
